package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainJaccard {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val df = graft.operators.Dedup.jaccardPairs(s, "/root/testdata/sf0.001")
    df.explain("formatted")
    s.stop()
  }
}
