package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over structured records — the
  * curation step that precedes any per-customer/per-author aggregation
  * on scraped or multi-source data: near-identical records referring to
  * the same real-world entity are detected pairwise and collapsed into
  * entity clusters. The documents-side near-dup family
  * ([[Dedup.editPairs]] etc.) works on free text; this family works on
  * the STRUCTURED side (typed key/attribute columns), with the two
  * classic stages:
  *
  *  1. **Blocking** — candidate pairs form only WITHIN a block (here
  *     `(c_nationkey, c_mktsegment)`), turning the O(N²) all-pairs
  *     product into an equi-join keyed on the block key. At 100 TB this
  *     is the load-bearing choice: pair volume is Σ_b |b|², bounded by
  *     the block-size distribution, and the join is a plain keyed
  *     shuffle (AQE splits oversized blocks; a pathological block —
  *     e.g. a null-heavy key — is the blocking-key-design problem every
  *     ER deployment documents, not an engine limit).
  *  2. **Pairwise matching** — a cheap codegen length-band prune
  *     (|len(a)−len(b)| ≤ 1 is a Levenshtein lower bound), then
  *     Spark's THRESHOLDED `levenshtein(l, r, 1)`: the banded DP
  *     early-exits at distance > 1, O(len·threshold) per pair instead
  *     of O(len²) — the kernel-level analogue of
  *     [[Dedup.editPairs]]' single-walk verify.
  *
  * Clustering is transitive closure over match pairs
  * ([[Dedup.connectedComponents]]' large/small-star rounds, O(log n)
  * keyed aggregates); every customer gets an entity id (min custkey in
  * its component) — singletons label themselves, so the output is a
  * total assignment a downstream `GROUP BY entity_id` can consume
  * directly.
  *
  * Reference context: the reference pipeline (a Singer→S3 sink) has no
  * joins at all (SURVEY §2.5); this family is north-star extension
  * surface.
  */
object Linkage {

  /** Blocked match pairs: (cust_a, cust_b, name_dist), cust_a < cust_b,
    * name Levenshtein distance ≤ 1 within (nation, segment) blocks.
    * The registered spelling r4–r11; now the spec-pinned twin of
    * [[blockedPairsDeletion]] (LinkageSpec pins equality at two SFs). */
  def blockedPairs(s: SparkSession, dir: String): DataFrame =
    matchPairs(s, dir).orderBy("cust_a", "cust_b")

  /** The unsorted pair relation — [[entityClusters]] consumes this
    * directly so the CC input never pays the presentation sort. */
  private def matchPairs(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val a = c.select(col("c_custkey").as("cust_a"), col("c_name").as("na"),
      col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
    val b = c.select(col("c_custkey").as("cust_b"), col("c_name").as("nb"),
      col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
    a.join(b, Seq("nk", "seg"))
      .filter(col("cust_a") < col("cust_b"))
      // Length band first: a 1-deletion/insertion changes length by 1,
      // so |Δlen| > 1 can never match — prunes before the DP kernel.
      .filter(abs(length(col("na")) - length(col("nb"))) <= 1)
      .withColumn("name_dist", levenshtein(col("na"), col("nb"), 1).cast("long"))
      .filter(col("name_dist") >= 0)
      .select("cust_a", "cust_b", "name_dist")
  }

  /** The SAME pair relation via deletion-variant blocking — the
    * 100-TB spelling AND the registered one (link_pairs, r12 on). The
    * blocked twin [[matchPairs]]' block key `(nation, segment)` has a
    * FIXED domain (125 keys in this corpus), so at N× data every block
    * grows N× and candidate volume Σ_b |b|² grows N² — measured at
    * 1×/10×/20× by the standalone ScaleProbe (fresh JVM per cell,
    * BASELINE.md r12): blocked 6.66/21.92/43.07 s (exp 0.52→0.97,
    * heading to candidate-bound linear-in-N² as fixed costs amortize)
    * vs this spelling 1.81/4.44/7.72 s (exp 0.39→0.80) — 3.7× at 1×,
    * 5.6× at 20×, flatter. This spelling replaces the quadratic block join
    * with the char-level analogue of [[Dedup.editPairs]]' exact-recall
    * neighborhood join: two strings are within Levenshtein 1 iff they
    * share a member of {s} ∪ {s minus one char} at the same position
    * sense — substitution at p ⇒ both sides' delete-at-p variants are
    * equal; insertion ⇒ the longer side's deletion equals the shorter
    * side's identity; equality ⇒ identity variants match. So the
    * variant equi-join (still keyed by the semantic block `(nk, seg)`)
    * is a candidate SUPERSET with exact recall, and the same
    * thresholded-DP verify yields a pair set IDENTICAL to
    * [[blockedPairs]] (spec-pinned). Candidates are bounded by
    * variant-group sizes — near-identical names only — instead of block
    * sizes, so volume scales with the DATA, not with |block|²: a keyed
    * shuffle of (L+1)·N variant rows and a verify over true near-pairs
    * plus hash-collision noise. Variants are xxhash64'd (8 B) before
    * the exchange; collisions cannot lose pairs (equal strings hash
    * equal) and false candidates die in the verify. */
  private[graft] def matchPairsDeletion(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val named = c.select(col("c_custkey"), col("c_name"),
      col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
    // {identity} ∪ {delete char p : p = 1..len} — hashed per variant.
    val variants = named.select(col("c_custkey"), col("nk"), col("seg"),
      explode(concat(
        array(xxhash64(col("c_name"))),
        transform(sequence(lit(1), length(col("c_name"))), p =>
          xxhash64(concat(col("c_name").substr(lit(1), p - 1),
            col("c_name").substr(p + 1, length(col("c_name")))))))).as("vh"))
    val cand = variants.as("a").join(variants.as("b"),
        col("a.nk") === col("b.nk") && col("a.seg") === col("b.seg") &&
          col("a.vh") === col("b.vh") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("cust_a"), col("b.c_custkey").as("cust_b"))
      .distinct()
    cand
      .join(named.select(col("c_custkey").as("cust_a"), col("c_name").as("na")),
        "cust_a")
      .join(named.select(col("c_custkey").as("cust_b"), col("c_name").as("nb")),
        "cust_b")
      .withColumn("name_dist", levenshtein(col("na"), col("nb"), 1).cast("long"))
      .filter(col("name_dist") >= 0)
      .select("cust_a", "cust_b", "name_dist")
  }

  /** [[blockedPairs]] on the deletion-variant candidate feed — identical
    * output, linear candidate volume (see [[matchPairsDeletion]]). */
  def blockedPairsDeletion(s: SparkSession, dir: String): DataFrame =
    matchPairsDeletion(s, dir).orderBy("cust_a", "cust_b")

  /** Entity assignment: (c_custkey, entity_id, n_members) for EVERY
    * customer; entity_id = smallest custkey in the match component. */
  def entityClusters(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir).select(col("c_custkey"))
    // Deletion-variant feed: identical pair relation (spec-pinned), so
    // identical components — at the candidate volume that scales with
    // the data, not with |block|² (see [[matchPairsDeletion]]).
    val comp = Dedup.connectedComponents(
      matchPairsDeletion(s, dir)
        .select(col("cust_a").as("doc_a"), col("cust_b").as("doc_b")),
      assumeNormalized = true)
    // localCheckpoint: lbl feeds both the size aggregate and the
    // join-back; without materialization each consumer re-runs the
    // blocked-pair join and the CC rounds.
    val lbl = keys.join(
        comp.select(col("node").as("c_custkey"), col("label")),
        Seq("c_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("label"), col("c_custkey")).as("entity_id"))
      .localCheckpoint()
    lbl.join(lbl.groupBy("entity_id").agg(count(lit(1)).as("n_members")),
        "entity_id")
      .select("c_custkey", "entity_id", "n_members")
      .orderBy("c_custkey")
  }

  /** SURVIVORSHIP — the golden-record build every master-data pipeline
    * runs after entity resolution: one merged record per
    * [[entityClusters]] entity under explicit, deterministic rules —
    * canonical name from the SMALLEST custkey member (recency/authority
    * stand-in; min_by is exact, custkey unique so no tie exists),
    * balance = the MAX member balance in exact cents, plus the member
    * count and key-sum fingerprint. The rules are aggregate expressions,
    * so survivorship is one keyed aggregate over the resolved entities —
    * no per-entity loop, no second pass.
    *
    * Scale shape: the deletion-variant pair join + CC rounds
    * (entityClusters' audited plan) then ONE entity-keyed exchange. */
  def goldenRecords(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(entityClusters(s, dir), "c_custkey")
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"),
        min_by(col("c_name"), col("c_custkey")).as("canonical_name"),
        max((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
          .as("max_bal_cents"),
        sum(col("c_custkey")).as("sum_keys"))
      .orderBy("entity_id")
}
