package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement: wall time + pair count of the jaccard prefix join
  * under rarest-first vs hash-order prefixes on word tokens (the
  * BASELINE.md 1b trade, re-checked after the round-4 kernel work). */
object CompareOrders {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def run(rf: Boolean): Unit = {
      def df = graft.operators.Dedup.wordPairsWithOrder(s, dir, 0.85, rf)
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[order] rarestFirst=$rf pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run(true); run(false)
    s.stop()
  }
}
