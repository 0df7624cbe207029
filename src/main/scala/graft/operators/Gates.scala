package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable correctness gates for the operators whose raw output
  * is not ANSI-SQL-expressible (seeded-hash LSH candidates, HLL sketches,
  * winnowing fingerprints). Each gate compares the approximate operator
  * against its EXACT in-repo counterpart inside one lazy DataFrame and
  * emits a single row of booleans (plus counts the oracle can recompute
  * in SQL), so the DuckDB hash-compare turns "no_oracle" into a hard
  * pass/fail: if recall/precision/consistency degrade, the boolean flips
  * and the hash mismatches.
  *
  * Bounds are calibrated against measured values on the synthetic corpus
  * (deterministic operators: seeded hyperplanes + xxhash64, so the
  * measured recall is a fixed property of the dataset, not a flaky
  * sample) with a safety margin.
  */
object Gates {

  /** MinHash-banded + exact-verified near-dup vs full exact jaccard:
    * precision is 1.0 by construction (every emitted pair is re-checked
    * with true jaccard), so the gate is banding recall — measured 0.993
    * at sf0.01, theoretical 1-(1-0.9^8)^8 = 0.988 at the 0.9 threshold. */
  def minhashGate(s: SparkSession, dir: String, threshold: Double = 0.9,
                  recallBound: Double = 0.95): DataFrame = {
    val truth = Dedup.jaccardPairs(s, dir, threshold).select("doc_a", "doc_b")
    val found = Dedup.minhashPairsVerified(s, dir, threshold = threshold)
      .select(col("doc_a").as("fa"), col("doc_b").as("fb"))
    truth.join(found,
        col("doc_a") === col("fa") && col("doc_b") === col("fb"), "left_outer")
      .agg(count(lit(1)).as("n_true"), count(col("fa")).as("n_hit"))
      .select(col("n_true"),
        (col("n_hit").cast("double") / col("n_true") >= recallBound).as("recall_ok"))
  }

  /** Pigeonhole-banded SimHash pairs vs blocked exact Hamming sweep at
    * maxDist=3 — the regime where 16-bit-chunk banding is provably exact,
    * so the gate is strict set EQUALITY, not a recall bound. */
  def simhashGate(s: SparkSession, dir: String): DataFrame = {
    val banded = Dedup.simhashPairs(s, dir, maxDist = 3)
      .select(col("doc_a"), col("doc_b"), lit(1).as("in_banded"))
    val brute = Dedup.simhashPairsBrute(s, dir, maxDist = 3)
      .select(col("doc_a"), col("doc_b"), lit(1).as("in_brute"))
    banded.join(brute, Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(lit(1)).as("n"),
        sum(when(col("in_banded").isNull || col("in_brute").isNull, 1)
          .otherwise(0)).as("mismatch"))
      .select((col("n") > 0).as("has_pairs"),
        (col("mismatch") === 0).as("banded_equals_brute"))
  }

  /** Recall@k of an approximate ANN result against the exact brute-force
    * top-k (both deterministic). n_exact is recomputable by the oracle's
    * own top-k SQL. */
  private def annGate(s: SparkSession, dir: String, approx: DataFrame,
                      recallBound: Double): DataFrame = {
    val exact = Similarity.bruteForceTopK(s, dir).select("query_id", "neighbor_id")
    exact.join(
        approx.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
        Seq("query_id", "neighbor_id"), "left_outer")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .select(col("n_exact"),
        (col("n_hit").cast("double") / col("n_exact") >= recallBound).as("recall_ok"))
  }

  /** Sign-LSH ANN recall gate — measured 0.96 at sf0.01 (16 bands x 4
    * bits; see [[Similarity.lshTopK]] for the band math). */
  def annLshGate(s: SparkSession, dir: String): DataFrame =
    annGate(s, dir, Similarity.lshTopK(s, dir), recallBound = 0.85)

  /** IVF ANN recall gate — measured 0.92 at sf0.01 (nlist=16, nprobe=4). */
  def annIvfGate(s: SparkSession, dir: String): DataFrame =
    annGate(s, dir, Similarity.ivfTopK(s, dir), recallBound = 0.85)

  /** Winnowing fingerprint sanity: (a) every doc emits between 1 and
    * max(n_tokens-2, 1) distinct fingerprints (the window count bound);
    * (b) near-identical docs (token-set jaccard >= 0.95) share most of
    * their fingerprint sets — the property fingerprinting exists for. */
  def fingerprintGate(s: SparkSession, dir: String,
                      overlapBound: Double = 0.5): DataFrame = {
    import graft.functions.ArrayOps.sortedIntersectCount
    val fsets = TextAnalysis.fingerprintSets(s, dir).localCheckpoint()
    val validity = fsets.agg(
      count(lit(1)).as("n_docs"),
      min((size(col("fps")) >= 1 &&
        size(col("fps")) <= greatest(col("n_tokens") - 2, lit(1))).cast("int"))
        .as("valid_min"))
    val pairs = Dedup.jaccardPairs(s, dir, 0.95).select("doc_a", "doc_b")
      .join(fsets.select(col("doc_id").as("doc_a"), col("fps").as("fps_a")), "doc_a")
      .join(fsets.select(col("doc_id").as("doc_b"), col("fps").as("fps_b")), "doc_b")
      .select((sortedIntersectCount(col("fps_a"), col("fps_b")).cast("double") /
        greatest(least(size(col("fps_a")), size(col("fps_b"))), lit(1)).cast("double"))
        .as("overlap"))
      .agg(coalesce(avg(col("overlap")), lit(1.0)).as("mean_overlap"))
    validity.crossJoin(pairs)
      .select(col("n_docs"), (col("valid_min") === 1).as("all_counts_valid"),
        (col("mean_overlap") >= overlapBound).as("neardup_overlap_ok"))
  }
}
