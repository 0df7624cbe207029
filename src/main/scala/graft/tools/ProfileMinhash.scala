package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline profiling aid: phase timings for minhashPairsVerified. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    noop(Dedup.minhashPairsVerified(spark, dir))

    val k = 64; val bands = 8; val r = k / bands
    t("signatures (explode+groupBy, 64 string-hash aggs)") {
      noop(Dedup.minhashSignatures(spark, dir, k))
    }
    val sigArr = t("sig array materialize") {
      Dedup.minhashSignatures(spark, dir, k)
        .select(col("doc_id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
        .localCheckpoint()
    }
    val cand = t("band join (first-match, no dedupe)") {
      Dedup.bandCandidates(sigArr, bands, r).localCheckpoint()
    }
    println(s"[profile] n_cand=${cand.count()}")
    t("full verified (end to end)") {
      noop(Dedup.minhashPairsVerified(spark, dir))
    }
    spark.stop()
  }
}
