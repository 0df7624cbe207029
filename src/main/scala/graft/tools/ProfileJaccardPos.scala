package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head of the two exact prefix-jaccard spellings on each dir
  * given on the command line:
  *   - `df`  — rarest-first prefixes (two extra keyed shuffles, minimal
  *     candidates): the spelling dedup_jaccard has run since r4.
  *   - `pos` — hash-order prefixes (zero extra exchanges) + the PPJoin
  *     positional overlap bound at the retained meeting.
  * Prints candidate volume (pre-verify join meetings that reach the
  * merge walk cannot be observed directly; the proxy is Σ pdf·(pdf−1)/2
  * over the prefix relation), output pair count, and median-of-3 wall
  * for each; asserts the two outputs are IDENTICAL (pair set and
  * jaccard values) before timing — exactness first.
  */
object ProfileJaccardPos {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val threshold = 0.85

    def dropCk(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = false))
    def timeIt(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        dropCk(); t
      }
      once() // warm-up
      Seq.fill(3)(once()).sorted.apply(1)
    }

    args.foreach { dir =>
      val df = () => graft.operators.Dedup.jaccardPairsRarestFirstUnsorted(
        spark, dir, threshold)
      val pos = () => graft.operators.Dedup.jaccardPairsUnsorted(
        spark, dir, threshold)
      // Exactness: identical pair sets and identical jaccard values.
      val a = df().select("doc_a", "doc_b", "jaccard")
      val b = pos().select("doc_a", "doc_b", "jaccard")
      val nA = a.count(); val nB = b.count()
      val nJoin = a.join(b, Seq("doc_a", "doc_b", "jaccard")).count()
      require(nA == nB && nA == nJoin,
        s"MISMATCH in $dir: df=$nA pos=$nB equal=$nJoin")
      dropCk()
      val tDf = timeIt(df)
      val tPos = timeIt(pos)
      println(f"[jacpos] $dir pairs=$nA%,d  df=${tDf}%.2f s  pos=${tPos}%.2f s" +
        f"  speedup=${tDf / tPos}%.2fx")
    }
    spark.stop()
  }
}
