package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset VERSIONING: snapshot-to-snapshot diff — the audit step every
  * managed training corpus runs between releases ("what changed between
  * corpus v1 and v2?"): how many documents were added, removed, edited,
  * or left untouched, per source. The counts drive retraining decisions
  * and feed the incremental paths (only `added`/`changed` docs need to
  * enter [[Dedup]]'s incremental artifact merge; `removed` docs trigger
  * index tombstones).
  *
  * The two versions are derived deterministically from the driver's
  * `documents` table so the oracle can rebuild them (the curate_urlnorm
  * convention for synthesized inputs):
  *   - v1 (old)  = docs with doc_id % 7 != 3   (the %7==3 docs arrive later)
  *   - v2 (new)  = docs with doc_id % 5 != 2   (the %5==2 docs were dropped),
  *                 with doc_id % 11 == 0 docs' text edited (a " rev2" suffix)
  *
  * Scale shape (the part that survives 100 TB): each side is projected
  * to `(doc_id, source, md5(text))` IN THE SCAN, so the full-outer join's
  * exchange carries 16-byte digests, never document bodies; the join
  * keys on doc_id (co-partitionable with how snapshot tables are
  * typically laid out, and AQE-skew-safe); the classification is one
  * codegen CASE over digest nullability/equality; the per-(status,
  * source) rollup is a map-side-combined aggregate over a tiny key
  * domain. Digest equality standing in for text equality is the
  * standard snapshot-diff trade (2^-128 collision odds); the digest is
  * compared, never emitted, so the oracle checks the same statuses from
  * direct text comparison if it prefers.
  */
object Versioning {
  import Tables.documents

  /** The synthesized old/new snapshot pair (deterministic; see object doc). */
  private[graft] def snapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = documents(s, dir)
    val v1 = docs.filter(col("doc_id") % 7 =!= 3)
    val v2 = docs.filter(col("doc_id") % 5 =!= 2)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    (v1, v2)
  }

  /** The INCREMENTAL-INGEST step the diff exists to drive: only the
    * docs the release added or edited enter the dedup path, checked
    * against the settled v1 corpus — per delta doc, its diff status and
    * whether its (possibly edited) text already exists in v1. An edited
    * doc whose new text collides with some OTHER settled doc's text is
    * a dup; brand-new text is what actually enters the corpus.
    *
    * Scale shape: only the DELTA (added ∪ changed — a small fraction of
    * the release) is exchanged, as 8-byte xxhash64 text hashes, against
    * the settled corpus's distinct hash set — in production a persisted
    * corpus-hash artifact (the [[Dedup.settledArtifact]] precedent), so
    * the settled side is a bucketed scan that never re-hashes. The
    * left-semi-style join never carries document bodies. Hash equality
    * stands in for text equality on the Spark side; the oracle compares
    * TEXTS directly, so a real xxhash64 collision would hash-mismatch
    * the row — the dedup_exact convention. */
  def incrementalIngest(s: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = snapshots(s, dir)
    val a = v1.select(col("doc_id"), md5(col("text")).as("h_old"))
    val delta = v2.select(col("doc_id"), col("text"),
        md5(col("text")).as("h_new"))
      .join(a, Seq("doc_id"), "left_outer")
      .filter(col("h_old").isNull || col("h_old") =!= col("h_new"))
      .select(col("doc_id"),
        when(col("h_old").isNull, "added").otherwise("changed").as("status"),
        col("text"))
    val settled = v1.select(xxhash64(col("text")).as("h")).distinct()
    delta.withColumn("h", xxhash64(col("text")))
      .join(settled.withColumn("in_settled", lit(true)), Seq("h"), "left_outer")
      .select(col("doc_id"), col("status"),
        coalesce(col("in_settled"), lit(false)).as("dup_of_settled"))
      .orderBy("doc_id")
  }

  /** Per-(status, source) diff counts between the two snapshots, with a
    * `sum_doc_id` integer fingerprint so the oracle pins membership, not
    * just cardinality. Statuses: added / removed / changed / unchanged. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = snapshots(s, dir)
    val a = v1.select(col("doc_id"), col("source").as("source_old"),
      md5(col("text")).as("h_old"))
    val b = v2.select(col("doc_id"), col("source").as("source_new"),
      md5(col("text")).as("h_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("source_new"), col("source_old")).as("source"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status", "source")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_doc_id"))
      .orderBy("status", "source")
  }
}
