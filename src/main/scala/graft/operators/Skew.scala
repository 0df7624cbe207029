package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A shuffle join hash-partitions both sides on the join key, so one hot
  * key (a null-ish default, a celebrity user, a catch-all category) lands
  * an entire cluster's worth of rows on one task. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) handles sort-merge cases at runtime;
  * salting is the plan-level alternative that also works for aggregations
  * feeding a join and for deterministic testing:
  *
  *  - the SKEWED side gets a deterministic salt in [0, factor) derived
  *    from row content (never `rand()` — results must be reproducible
  *    across retries, or a task re-run silently changes the answer);
  *  - the OTHER side is exploded `factor`× so every (key, salt) pair
  *    still meets exactly once;
  *  - the join key becomes (key, salt), spreading the hot key over
  *    `factor` tasks.
  */
object Skew {

  /** Deterministic row salt in [0, factor). */
  def salt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor.toLong)).cast("int")

  /** The engine's salt-factor decision (r16 — the SEVENTH engine
    * decision; the first PURE-PLAN one since band geometry: salting is
    * output-invariant at ANY factor, so the decision never needs a
    * bit-identity argument — the q23 oracle asserts equality to the
    * plain join at every factor including 1). `factor` = the derived
    * salt, `topCount`/`sampledRows` = the histogram statistics it came
    * from, `sampleMod` = the systematic-sample modulus (1 = exact). */
  final case class SaltPlan(factor: Int, topCount: Long, sampledRows: Long,
                            sampleMod: Long)

  /** Row budget for the decision's systematic sample. */
  val SaltSampleRows = 65536L

  /** AUTO salt factor from the skewed side's own key histogram. The
    * hot-key failure mode is quantitative — a key holding share σ of
    * the rows lands σ·R rows on ONE task while the ideal is R/P — so
    * the mitigation is too: spread that key over ⌈σ·P⌉ tasks and its
    * per-task load returns to the average. Hence
    *
    *   factor = clamp(1, P)( ⌈topCount · P / sampledRows⌉ )
    *
    * — integer arithmetic end-to-end, so the DuckDB oracle replays the
    * whole decision. σ is estimated from a SYSTEMATIC row sample
    * (`sampleBy % mod == 0` with mod = max(1, rows/[[SaltSampleRows]]);
    * `sampleBy` is any stable numeric row id — the same column the
    * caller already provides as salt material), which keeps the
    * histogram job bounded AND SQL-replayable (an xxhash64 sample
    * would not be). Sampling at rate p scales topCount and sampledRows
    * together, so the share estimate — and the factor — is
    * sampling-rate invariant in expectation. The decision is two
    * bounded aggregate jobs and a ONE-ROW collect (control plane).
    *
    * The payoff direction most corpora hit: a UNIFORM key histogram
    * derives factor 1, and [[saltedJoinAuto]] then skips the salt
    * machinery entirely — the pre-r16 spelling exploded the build side
    * `factor`× on every corpus, skewed or not. */
  def chooseSaltFactor(skewed: DataFrame, key: String, sampleBy: Column,
                       parallelism: Int = -1): SaltPlan = {
    val p =
      if (parallelism > 0) parallelism
      else skewed.sparkSession.sessionState.conf.numShufflePartitions
    val rows = skewed.count()
    val mod = math.max(1L, rows / SaltSampleRows)
    val sample =
      if (mod == 1L) skewed else skewed.filter(pmod(sampleBy, lit(mod)) === 0)
    val hist = sample.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max("c").as("topc"), sum("c").as("sr")).head()
    if (hist.isNullAt(0)) return SaltPlan(1, 0L, 0L, mod) // empty relation
    val topc = hist.getLong(0)
    val sr = hist.getLong(1)
    val factor = math.max(1L, math.min(p.toLong, (topc * p + sr - 1) / sr))
    SaltPlan(factor.toInt, topc, sr, mod)
  }

  /** [[saltedJoin]] with the ENGINE-CHOSEN factor: salts only when the
    * measured histogram says the join is skewed; factor 1 is the plain
    * join — no salt column, no build-side explode. Output equals the
    * plain join in EVERY regime (salting is output-invariant; the
    * registered rows' oracle asserts it). */
  def saltedJoinAuto(skewed: DataFrame, other: DataFrame, key: String,
                     sampleBy: Column, saltBy: Seq[String],
                     parallelism: Int = -1): (DataFrame, SaltPlan) = {
    val plan = chooseSaltFactor(skewed, key, sampleBy, parallelism)
    val joined =
      if (plan.factor <= 1) skewed.join(other, Seq(key))
      else saltedJoin(skewed, other, key, plan.factor, saltBy)
    (joined, plan)
  }

  /** Inner-join `skewed` with `other` on `skewed(key) === other(key)`,
    * spreading each key of the skewed side over `factor` tasks. `saltBy`
    * are skewed-side columns that disambiguate rows sharing a key (any
    * stable id column works). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int, saltBy: Seq[String]): DataFrame = {
    val salted = skewed.withColumn("__salt",
      salt(factor, saltBy.map(skewed(_)): _*))
    val exploded = other
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
