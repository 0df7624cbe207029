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

  /** Snapshot RETENTION sweep (garbage collection) — the storage-side
    * companion to [[snapshotDiff]]: after a release supersedes the old
    * snapshot, which data files does the store still need and which are
    * orphaned? Models the copy-on-write layout every table format uses
    * (a snapshot references immutable files; a release rewrites only the
    * files it touches): file granularity = (source, doc_id % 16) bucket.
    *
    *   - v1 wrote one file per (source, bucket) it has docs in;
    *   - v2 REWRITES a bucket iff any doc in it was added or edited
    *     (h_new with no h_old, or h_new != h_old); otherwise v2 keeps
    *     referencing the v1 file (pure carry-over, even if some docs
    *     were removed — a removal alone marks the bucket rewritten too,
    *     since copy-on-write must materialize the survivor set);
    *   - retention policy "keep latest only": live = files v2 references;
    *     orphaned = v1 files of rewritten buckets + v1 files of buckets
    *     v2 no longer has docs in.
    *
    * Scale shape: both sides project to (source, bucket, 16-byte digest)
    * in the scan; the per-doc full-outer join keys on doc_id (the
    * [[snapshotDiff]] exchange, digests only); the file-level rollup is
    * a map-side-combined aggregate over the (source × 16)-key bucket
    * domain — constant exchange regardless of corpus size. The sweep
    * never lists the object store: the live/orphan sets come from the
    * snapshot metadata join, which is how production GC avoids
    * O(files-in-store) LIST calls at 100 TB.
    *
    * Output per source: v1/rewritten/live/orphaned file counts and an
    * orphaned-bucket-id sum so the oracle pins WHICH files die, not just
    * how many. */
  def snapshotGc(s: SparkSession, dir: String, nBuckets: Int = 16): DataFrame = {
    val (v1, v2) = snapshots(s, dir)
    val a = v1.select(col("doc_id"), col("source").as("source_old"),
      (col("doc_id") % nBuckets).as("bucket_old"), md5(col("text")).as("h_old"))
    val b = v2.select(col("doc_id"), col("source").as("source_new"),
      (col("doc_id") % nBuckets).as("bucket_new"), md5(col("text")).as("h_new"))
    val perDoc = a.join(b, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source_new"), col("source_old")).as("source"),
        coalesce(col("bucket_new"), col("bucket_old")).as("bucket"),
        col("h_old").isNotNull.as("in_v1"),
        col("h_new").isNotNull.as("in_v2"),
        // added, changed, or removed — any of these forces a rewrite of
        // the bucket's file in v2 (copy-on-write at file granularity)
        (col("h_old").isNull || col("h_new").isNull ||
          col("h_old") =!= col("h_new")).as("touched"))
    perDoc.groupBy("source", "bucket")
      .agg(bool_or(col("in_v1")).as("f_v1"),
        bool_or(col("in_v2")).as("f_v2"),
        // rewritten iff v2 still has docs in the bucket AND anything in
        // it was touched — a removed doc has in_v2=false itself, but its
        // removal still forces the survivor set to be materialized
        (bool_or(col("in_v2")) && bool_or(col("touched"))).as("rewritten"))
      .groupBy("source")
      .agg(
        sum(when(col("f_v1"), 1L).otherwise(0L)).as("files_v1"),
        sum(when(col("rewritten"), 1L).otherwise(0L)).as("files_rewritten"),
        // live v1 file: v2 still has docs in the bucket and none touched
        sum(when(col("f_v1") && col("f_v2") && !col("rewritten"), 1L)
          .otherwise(0L)).as("files_live_v1"),
        sum(when(col("f_v1") && (col("rewritten") || !col("f_v2")), 1L)
          .otherwise(0L)).as("files_orphaned"),
        sum(when(col("f_v1") && (col("rewritten") || !col("f_v2")),
          col("bucket")).otherwise(0L)).as("sum_orphan_bucket"))
      .orderBy("source")
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

  /** TIME-TRAVEL RESTORE — the consumer of [[snapshotDiff]]'s
    * categories: reconstruct v1 FROM v2 plus a REVERSE DELTA, then
    * prove the reconstruction exact. The reverse delta is what a
    * versioned store persists per release (Delta/Iceberg keep it as
    * previous file versions): the OLD payload of every changed or
    * removed row, plus the id set the release added. Restore = v2
    * minus the additions, with changed rows' texts reverted from the
    * delta payload and removed rows re-added from it.
    *
    * Scale shape: the delta is small by construction (the release's
    * churn, not the corpus), every join is doc_id-keyed (anti-join for
    * drops, outer join + coalesce for reverts, anti-join union for
    * re-adds) and the equality proof is one full-outer join aggregated
    * to a single boolean — no collect, no broadcast of anything
    * corpus-sized. Output one row: the three reverse-delta category
    * counts, |v1|, and the exactness pin (both sides deterministic, so
    * the oracle pins `true` and recomputes every count — the
    * maintained-equals-full precedent). */
  def snapshotRestore(s: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = snapshots(s, dir)
    val a = v1.select(col("doc_id").as("id1"), col("text").as("t1"))
    val b = v2.select(col("doc_id").as("id2"), col("text").as("t2"))
    val j = a.join(b, col("id1") === col("id2"), "full_outer").localCheckpoint()
    val stats = j.agg(
      sum(when(col("id1").isNull, 1L).otherwise(0L)).as("n_dropped"),
      sum(when(col("id2").isNull, 1L).otherwise(0L)).as("n_readded"),
      sum(when(col("id1").isNotNull && col("id2").isNotNull &&
        col("t1") =!= col("t2"), 1L).otherwise(0L)).as("n_reverted"),
      sum(when(col("id1").isNotNull, 1L).otherwise(0L)).as("n_v1"))
    // the reverse delta: old payloads of changed + removed rows
    val delta = j.filter(col("id2").isNull ||
        (col("id1").isNotNull && col("t1") =!= col("t2")))
      .select(col("id1").as("doc_id"), col("t1").as("old_text"))
    val addedIds = j.filter(col("id1").isNull)
      .select(col("id2").as("doc_id"))
    val restored = v2.select(col("doc_id"), col("text"))
      .join(addedIds, Seq("doc_id"), "left_anti")
      .join(delta, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("old_text"), col("text")).as("text"))
      .unionByName(delta
        .join(v2.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("old_text").as("text")))
    val eq = restored.select(col("doc_id"), col("text").as("rt"))
      .join(a.select(col("id1").as("doc_id"), col("t1")), Seq("doc_id"),
        "full_outer")
      .agg((coalesce(sum(when(col("rt").isNull || col("t1").isNull ||
        col("rt") =!= col("t1"), 1L).otherwise(0L)), lit(0L)) === 0L)
        .as("restore_exact"))
    stats.crossJoin(eq) // 1 x 1 rows
  }

  /** COMPACTION PLANNER — the small-file maintenance sweep every
    * copy-on-write table needs: after releases fragment the layout into
    * many under-sized files, greedily pack adjacent files (per source, in
    * bucket order) into rewrite groups of ≥ `targetDocs` documents.
    * Output per (source, group): file count, doc/char volume, and the
    * first/last bucket so the oracle pins WHICH files merge, not just how
    * many. Group assignment is the winsorize/pack running-offset trick:
    * group = ⌊cum_docs_before / targetDocs⌋ — a closed form over the
    * cumulative sum, not a sequential loop, so it parallelizes.
    *
    * Scale shape: the only data-scale exchange is the per-(source,
    * bucket) file-stats aggregate (map-side combined, bounded key
    * domain — source × 16 buckets); the cumulative window partitions by
    * source over ≤ 16 rows each; the rollup is again bounded-domain. The
    * planner never lists the object store — file stats come from
    * snapshot metadata, the [[snapshotGc]] convention. */
  def compactionPlan(s: SparkSession, dir: String, nBuckets: Int = 16,
                     targetDocs: Long = 12): DataFrame = {
    val (_, v2) = snapshots(s, dir)
    val files = v2
      .select(col("source"), (col("doc_id") % nBuckets).as("bucket"),
        col("n_chars"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("n_docs").over(w), lit(0L)))
      .withColumn("grp", expr(s"cum_before div $targetDocs"))
      .groupBy("source", "grp")
      .agg(count(lit(1)).as("n_files"), sum("n_docs").as("n_docs"),
        sum("chars").as("sum_chars"), min("bucket").as("first_bucket"),
        max("bucket").as("last_bucket"))
      .orderBy("source", "grp")
  }
}
