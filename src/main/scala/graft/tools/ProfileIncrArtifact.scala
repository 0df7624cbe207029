package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures what the persisted settled-corpus artifacts buy the nightly
  * incremental dedup run ([[graft.operators.Dedup.incrementalPairsArtifact]]
  * vs [[graft.operators.Dedup.incrementalPairs]]): the recompute path pays
  * the corpus df count + per-doc order rebuild + prefix exchange EVERY run;
  * the artifact path pays them once at build time and the nightly cost
  * tracks the increment alone. BASELINE.md records these numbers.
  *
  * Usage: runMain graft.tools.ProfileIncrArtifact [sfDir]
  */
object ProfileIncrArtifact {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // artifact build (the once-paid cost), measured separately
    val tBuild = timed(graft.operators.Dedup.settledArtifact(spark, dir, 0.85, 10))
    // warm both paths (JIT + codegen), then measure
    noop(graft.operators.Dedup.incrementalPairsArtifact(spark, dir))
    noop(graft.operators.Dedup.incrementalPairs(spark, dir))
    val tArtifact = timed(noop(graft.operators.Dedup.incrementalPairsArtifact(spark, dir)))
    val tRecompute = timed(noop(graft.operators.Dedup.incrementalPairs(spark, dir)))
    println(f"incr_artifact dir=$dir build_once_s=$tBuild%.2f " +
      f"nightly_artifact_s=$tArtifact%.2f nightly_recompute_s=$tRecompute%.2f")

    // Structural audit: in the nightly plan the settled corpus must be a
    // bucketed table scan feeding the join with NO aggregation above it —
    // the df count + per-doc order rebuild exist only in the build job.
    val plan = graft.operators.Dedup
      .incrementalPairsArtifactUnsorted(spark, dir)
      .queryExecution.executedPlan.toString
    val corpusScans = plan.linesIterator.count(_.contains("graft_settled_prefix"))
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    val bucketed = plan.contains("SelectedBucketsCount") ||
      plan.contains("Bucketed: true")
    println(s"incr_artifact_plan corpus_scans=$corpusScans " +
      s"hash_aggregates=$aggs bucketed_scan=$bucketed")
    spark.stop()
  }
}
