package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Offline calibration aid (like [[MeasureRecall]]): prints the
  * fingerprint gate's overlap distribution over its sequence-level truth
  * pairs, per SF dir given as args. The gate bounds in
  * [[graft.operators.Gates]] are corpus-calibrated — this is the tool that
  * measures the margin so a bound change is a recorded decision, not a
  * guess. Usage: runMain graft.tools.GateMargins /root/testdata/sf0.01
  */
object GateMargins {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.ArrayOps.sortedIntersectCount
    args.foreach { dir =>
      val fsets = TextAnalysis.fingerprintSets(spark, dir).localCheckpoint()
      val truth = Dedup.shinglePairsUnsorted(spark, dir, 0.9)
        .select("doc_a", "doc_b")
      val ov = truth
        .join(fsets.select(col("doc_id").as("doc_a"), col("fps").as("fps_a")), "doc_a")
        .join(fsets.select(col("doc_id").as("doc_b"), col("fps").as("fps_b")), "doc_b")
        .select((sortedIntersectCount(col("fps_a"), col("fps_b")).cast("double") /
          greatest(least(size(col("fps_a")), size(col("fps_b"))), lit(1)).cast("double"))
          .as("overlap"))
      println(s"== $dir ==")
      ov.agg(count(lit(1)).as("n_pairs"), avg("overlap").as("mean"),
        min("overlap").as("min"), expr("percentile(overlap, 0.1)").as("p10"))
        .show(false)
    }
    spark.stop()
  }
}
