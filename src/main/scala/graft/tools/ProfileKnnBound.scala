package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the branch-and-bound kNN build's prune rate and wall time vs
  * the brute all-pairs pin ([[graft.operators.Graph.knnBuild]] /
  * [[graft.operators.Graph.knnDirectedBrute]]) — the numbers BASELINE.md
  * records for the graph family's scale story.
  *
  * Probe survival is the honest adaptivity metric: surviving (query,
  * other-list) pairs / (N × (nlist−1)). 1.0 means the corpus geometry
  * defeats the bound (uniform directions — every list could hold a
  * neighbor); a clustered corpus collapses it toward nprobe/nlist.
  *
  * Usage: runMain graft.tools.ProfileKnnBound [sfDir] [k]
  */
object ProfileKnnBound {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val nlist = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = graft.operators.Similarity.corpus(spark, dir).count()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up (JIT + codegen), then measure
    graft.operators.Graph.knnDirected(spark, dir, k, nlist)
      .write.format("noop").mode("overwrite").save()
    val (_, tPruned) = timed(graft.operators.Graph.knnDirected(spark, dir, k, nlist)
      .write.format("noop").mode("overwrite").save())
    graft.operators.Graph.knnDirectedBrute(spark, dir, k)
      .write.format("noop").mode("overwrite").save()
    val (_, tBrute) = timed(graft.operators.Graph.knnDirectedBrute(spark, dir, k)
      .write.format("noop").mode("overwrite").save())

    val (_, probes, _) = graft.operators.Graph.knnBuild(spark, dir, k, nlist)
    val nProbes = probes.count()
    val maxProbes = n * (nlist - 1)
    println(f"knn_bound dir=$dir n=$n k=$k nlist=$nlist " +
      f"probes=$nProbes/$maxProbes (${nProbes.toDouble / maxProbes}%.3f) " +
      f"pruned_s=$tPruned%.2f brute_s=$tBrute%.2f")

    // Incremental maintenance: τ-prune survival of the settled×increment
    // update pass (the tracks-batch-size claim), and maintained vs full
    // rebuild wall time.
    import org.apache.spark.sql.functions.col
    val nIncr = graft.operators.Similarity.corpus(spark, dir)
      .filter(col("vec_id") % 10 === 0).count()
    val nSettled = n - nIncr
    val (_, updates, _) = graft.operators.Graph.knnIncrBuild(spark, dir, k, nlist)
    val nUpdates = updates.count()
    graft.operators.Graph.knnIncrMaintained(spark, dir, k, nlist)
      .write.format("noop").mode("overwrite").save() // warm (settled table builds)
    val (_, tIncr) = timed(graft.operators.Graph.knnIncrMaintained(spark, dir, k, nlist)
      .write.format("noop").mode("overwrite").save())
    println(f"knn_incr dir=$dir settled=$nSettled incr=$nIncr " +
      f"update_candidates=$nUpdates/${nSettled * nIncr} " +
      f"(${nUpdates.toDouble / (nSettled * nIncr)}%.4f of naive SxI) " +
      f"maintained_s=$tIncr%.2f full_s=$tPruned%.2f")
    spark.stop()
  }
}
