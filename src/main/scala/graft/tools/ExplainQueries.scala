package graft.tools

import org.apache.spark.sql.SparkSession

/** Offline plan-audit aid: prints the formatted physical plan for the
  * named registered queries (all when no names given) so scan pushdown,
  * join strategies and exchange counts can be reviewed. */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (n <- names; fn <- graft.SparkEntry.queries.get(n)) {
      println(s"===== $n =====")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
