package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline plan-audit aid for the composed pipeline interiors (their
  * registered forms localCheckpoint before the presentation sort, so
  * ExplainQueries only shows the tail): rebuilds the chain WITHOUT the
  * checkpoint and counts Sort/Exchange nodes in the optimized plan —
  * a stage operator's trailing orderBy must be eliminated under the
  * consuming join, not paid mid-pipeline. */
object ExplainPipeline {
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
    import graft.operators._

    val docs = Tables.documents(spark, dir)
    val qualityKept = Curation.qualityFilter(spark, dir)
      .filter(col("kept")).select("doc_id")
    val joined = docs.join(qualityKept, "doc_id").select(col("doc_id"))
    val opt = joined.queryExecution.optimizedPlan
    val sorts = opt.collect { case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s }
    println(s"[explain] quality-join optimized Sort nodes: ${sorts.length}")
    println(opt.treeString.linesIterator.take(25).mkString("\n"))

    // export_training capstone audit: stage-boundary materializations
    // (ExistingRDD leaves beyond the near-dup prefix self-join reuse),
    // exchange census, and the identity of the final hash exchange —
    // the three properties the capstone's scaladoc claims.
    val cap = DocPipeline.exportTraining(spark, dir)
    // Execute THIS QueryExecution (a noop write would run under its own,
    // leaving this one's AQE plan un-adapted — the audit would print the
    // initial plan, not the final one): executing the AdaptiveSparkPlanExec
    // root directly materializes its final physical plan.
    cap.queryExecution.executedPlan.execute().count()
    val plan = cap.queryExecution.executedPlan.toString
    val rdds = plan.linesIterator.filter(_.contains("ExistingRDD")).toSeq
    println(s"[explain] export_training ExistingRDD leaves: ${rdds.length} " +
      s"(all two-branch reuses: ${rdds.forall(l =>
        l.contains("ptok") || (l.contains("rk") && l.contains("n_tokens")))})")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    println(s"[explain] export_training exchanges: ${exchanges.length}")
    exchanges.foreach(e => println("  " + e.trim.take(140)))
    spark.stop()
  }
}
