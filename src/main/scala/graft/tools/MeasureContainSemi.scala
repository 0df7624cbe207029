package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 measurement: would a prefix-token semi-join (guide §3.2 — drop
  * container-side posting rows whose token can never meet a prefix)
  * shrink the containment join's dominant exchange, and on which
  * corpus? Prints, per corpus: distinct tokens, distinct PREFIX
  * tokens, container-side posting rows before/after the filter, and
  * the wall time of the current carry join vs the semi-filtered one
  * (same output — asserted by count).
  *
  * Usage: runMain graft.tools.MeasureContainSemi [dir] [threshold]
  */
object MeasureContainSemi {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.95)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val sets = graft.operators.Dedup.hashedTokenSets(s, dir).localCheckpoint()
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefToks = sets.select(explode(slice(col("toks"), lit(1), prefLen)).as("tok"))
      .distinct()
    val allToks = sets.select(explode(col("toks")).as("tok")).distinct()
    val nPref = prefToks.count()
    val nAll = allToks.count()
    val postingRows = sets.select(col("sz")).agg(sum("sz")).head().getLong(0)
    val survivors = sets.select(explode(col("toks")).as("tok"))
      .join(prefToks, Seq("tok"), "left_semi").count()
    println(f"[semi] dir=$dir t=$threshold distinct_tokens=$nAll " +
      f"distinct_prefix_tokens=$nPref (${100.0 * nPref / nAll}%.1f%%) " +
      f"posting_rows=$postingRows surviving=$survivors " +
      f"(${100.0 * survivors / postingRows}%.1f%%)")

    def timed(name: String)(df: => org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val n = df.count()
      println(f"[semi] $name%-12s median=${ts(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(",")}) rows=$n")
      n
    }
    val a = timed("carry")(
      graft.operators.Dedup.containmentPairsFromSetsNoSemi(sets, threshold))
    val b = timed("carry+semi")(
      graft.operators.Dedup.containmentPairsFromSets(sets, threshold))
    assert(a == b, s"row count mismatch: $a vs $b")
    s.stop()
  }
}
