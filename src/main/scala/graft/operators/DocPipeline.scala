package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline, composed from the
  * engine's operators: exact dedup → near-dup removal → quality filter →
  * token accounting. One DataFrame chain, so Catalyst plans the whole
  * thing together (the dedup group-by and the near-dup pair join are the
  * only shuffles; everything else stays in the scan pipeline).
  *
  * Removal semantics are deterministic and order-free: a doc is dropped
  * iff some SURVIVING-exact-dedup doc with a smaller id is a near-dup of
  * it (jaccard >= `nearDupThreshold`) — no greedy iteration, so the
  * result is independent of partitioning and exactly SQL-expressible for
  * the oracle.
  */
object DocPipeline {

  def curate(s: SparkSession, dir: String,
             nearDupThreshold: Double = 0.9,
             minWords: Int = 5): DataFrame =
    curateUnsorted(s, dir, nearDupThreshold, minWords)
      // sort sampling must not re-run the dedup + near-dup pipeline
      .localCheckpoint()
      .orderBy("doc_id")

  /** The curated set without the presentation sort (and its checkpoint):
    * [[writeShards]] repartitions by (lang, block) immediately, which
    * would destroy a global doc_id ordering — consuming the sorted
    * variant there paid a full range-partition exchange + sort of the
    * whole corpus for nothing. */
  private[graft] def curateUnsorted(s: SparkSession, dir: String,
                                    nearDupThreshold: Double = 0.9,
                                    minWords: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)

    // 1. exact dedup: survivor = min doc_id per identical text, grouped on
    //    xxhash64(text) so the shuffle carries 8-byte keys instead of
    //    document bodies (the [[Dedup.exactByHash]] scale path, pinned
    //    equal to text-keyed grouping; ~n²/2⁶⁵ collision odds are nil
    //    below ~10⁹ distinct docs)
    val survivors = docs.select(col("doc_id"), xxhash64(col("text")).as("th"))
      .groupBy("th").agg(min("doc_id").as("doc_id"))
      .select("doc_id")

    // 2. near-dup removal among survivors: drop the higher id of any
    //    qualifying pair (pairs from the jaccard operator). No broadcast
    //    hints: the survivor id set is O(N), so forcing it to every
    //    executor breaks at scale — semi-joins on the id keep every
    //    exchange keyed, and AQE still broadcasts when a side is
    //    genuinely small at runtime.
    val pairs = Dedup.jaccardPairsUnsorted(s, dir, nearDupThreshold)
      .join(survivors.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .join(survivors.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
    val removed = pairs.select(col("doc_b").as("doc_id")).distinct()
    val kept = survivors.join(removed, Seq("doc_id"), "left_anti")

    // 3. quality gate + token accounting on the kept set
    docs.join(kept, "doc_id")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .filter(col("n_tokens") >= minWords)
  }

  /** Materialize the curated corpus as training shards: parquet
    * partitioned by language, `maxRecordsPerFile`-bounded, rows inside a
    * shard in doc_id order (reader locality + diffable output).
    *
    * Layout reasoning for 100 TB: `partitionBy(lang)` gives the
    * directory pruning a per-language training job wants;
    * `repartition(lang, doc_id-block)` keeps MANY tasks per big language
    * (a plain repartition(lang) funnels each language through ONE task)
    * while bounding the file count per partition dir to shuffle
    * parallelism × nothing — each task writes only the languages it
    * holds; `maxRecordsPerFile` caps shard size regardless. */
  def writeShards(s: SparkSession, dir: String, out: String,
                  maxRecordsPerFile: Int = 100000,
                  tasksPerLang: Int = 8): Unit =
    curateUnsorted(s, dir)
      .repartition(col("lang"), pmod(col("doc_id"), lit(tasksPerLang)))
      .sortWithinPartitions("doc_id")
      .write
      .partitionBy("lang")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(out)
}
