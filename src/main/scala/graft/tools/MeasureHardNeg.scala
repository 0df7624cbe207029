package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement harness: sweeps (nprobe, rerank) for
  * [[graft.operators.Similarity.hardNegativesFromIndex]] against the
  * brute gate truth ([[graft.operators.Similarity.hardNegatives]]) and
  * prints, per scale factor, whether the mined output is IDENTICAL and
  * how long the served plan takes — the evidence behind the registered
  * configuration (BASELINE.md). Run:
  * `sbt "runMain graft.tools.MeasureHardNeg"`. */
object MeasureHardNeg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (sf <- sfs) {
      val brute = graft.operators.Similarity.hardNegatives(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      for ((np, rr) <- Seq((12, 256), (14, 512), (16, 256), (16, 512))) {
        val t0 = System.nanoTime()
        val served = graft.operators.Similarity
          .hardNegativesFromIndex(spark, sf, nprobe = np, rerank = rr).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val diff = (served -- brute).size + (brute -- served).size
        println(f"RESULT sf=$sf nprobe=$np rerank=$rr equal=${served == brute} diff=$diff t=$dt%.2f")
      }
    }
    spark.stop()
  }
}
