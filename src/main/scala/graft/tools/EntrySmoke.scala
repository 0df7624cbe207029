package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke check: SparkEntry.entry rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(s).count()
    println(s"[entry] rows=$rows")
    s.stop()
    if (rows == 0) sys.exit(1) // an advertised smoke check must actually gate
  }
}
