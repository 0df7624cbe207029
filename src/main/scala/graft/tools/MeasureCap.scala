package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the df-cap's exactness trade on a corpus (judge r14 Next
  * #1): the auto coverage cap, the candidate-volume cut it buys, and
  * the recall it costs vs the uncapped rarest truth — the numbers the
  * BASELINE cells and the containCappedGate bound come from.
  *
  * Per (dir, threshold): the [[graft.operators.Dedup.cappedPlanOn]]
  * statistics (tailDf, maxDf), true pair count, capped pair count,
  * recall = capped/true (the capped join is a SUBSET of truth — also
  * asserted here value-for-value), and the rarest-prefix candidate
  * sums with and without the cap (duckdb-replayable decomposition:
  * Σ over prefix entries of df(tok), restricted to df ≤ cap).
  *
  * Run:  java -cp ... graft.tools.MeasureCap <dir> [threshold]
  * Env:  SPARK_GRAFT_CPUS (default 32)
  */
object MeasureCap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.drop(1).headOption.map(_.toDouble).getOrElse(0.95)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = graft.operators.Tables.documents(spark, dir)
    val plan = Dedup.cappedPlanOn(docs, threshold)
    val sets = Dedup.hashedTokenSetsOf(docs).localCheckpoint()

    // candidate decomposition: Σ over df-ordered prefix entries of
    // df(tok), total and under the cap — the term the r14 cells proved
    // grows exp 2.0 on saturated corpora
    val exploded = sets.select(col("doc_id"), col("sz"),
      explode(col("toks")).as("tok"))
    val dfc = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefixDfs = exploded.join(dfc, "tok").groupBy("doc_id", "sz")
      .agg(sort_array(collect_list(col("df"))).as("dfs"))
      .select(explode(slice(col("dfs"), lit(1), prefLen)).as("pdf"))
    val cands = prefixDfs.agg(
      sum(col("pdf")).as("cand_all"),
      sum(when(col("pdf") <= plan.maxDf, col("pdf")).otherwise(0L))
        .as("cand_capped")).head()

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val t0 = System.nanoTime()
    val truth = canon(Dedup.containmentPairsRarestFromSets(sets, threshold))
    val tTruth = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val capped = canon(Dedup.containmentPairsRarestFromSets(sets, threshold,
      maxDf = plan.maxDf))
    val tCap = (System.nanoTime() - t1) / 1e9
    val subset = capped.forall { case (k, v) => truth.get(k).contains(v) }
    require(subset, "capped output must be a value-identical subset of truth")
    val recall =
      if (truth.isEmpty) 1.0 else capped.size.toDouble / truth.size
    def ms(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""{"metric":"cap_measure","dir":"$dir","threshold":$threshold,""" +
      s""""tail_df":${ms(plan.tailDf)},"max_df":${plan.maxDf},""" +
      s""""coverage":${plan.coverage},""" +
      s""""cand_all":${cands.getLong(0)},"cand_capped":${cands.getLong(1)},""" +
      s""""n_true":${truth.size},"n_capped":${capped.size},""" +
      s""""recall":${ms(recall)},"subset":$subset,""" +
      s""""truth_sec":${ms(tTruth)},"capped_sec":${ms(tCap)}}""")
    spark.stop()
  }
}
