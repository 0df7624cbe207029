package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline, over the
  * `documents` table (SURVEY.md §7.4 north-star extensions).
  *
  * Scale design: every variant is shuffle-bounded by (doc_id, token/band)
  * exchanges — no driver materialization, no all-pairs comparison except
  * where candidates are first narrowed by banding/inverted-index. At 100 TB
  * the knobs are the shingle document-frequency cut (`maxDf`) and the
  * band/row split; both are explicit parameters.
  */
object Dedup {
  import Tables.documents

  /** Exact dedup (hash-groupBy on content): one row per distinct text with
    * the surviving (minimum) doc_id and the duplicate count. At scale,
    * group on xxhash64(text) first and only compare full text within hash
    * groups; here text is small so grouping on it directly is one shuffle. */
  def exact(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dupes"))
      .select("doc_id", "n_dupes")
      .orderBy("doc_id")

  /** Exact dedup, at-scale variant: group on xxhash64(text) so the
    * shuffle carries 8-byte keys instead of document bodies; the min/count
    * per hash group equals [[exact]]'s output modulo 64-bit collisions
    * (~n²/2⁶⁵ — none expected below ~10⁹ distinct docs; pinned against
    * [[exact]] by OperatorsSpec). */
  def exactByHash(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dupes"))
      .select("doc_id", "n_dupes")
      .orderBy("doc_id")

  /** Distinct word tokens per doc: (doc_id, token) exploded pairs. */
  private def tokenSet(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"))

  /** Exact token-set Jaccard near-dup. Two physical strategies:
    *
    * This default: token sets as arrays, pairs via a broadcast
    * nested-loop self-join, `array_intersect` per pair — fully codegen'd,
    * right when the vocabulary is small/dense (every doc shares tokens
    * with every other, so an inverted index degenerates to O(N²·tokens)
    * shuffle rows; the array form caps the per-pair cost at the array
    * sizes). The synthetic corpus is exactly this shape.
    *
    * [[jaccardPairsInverted]]: inverted index + document-frequency cut —
    * the sparse-vocab scale path for real text at 100 TB, where Zipfian
    * tokens above `maxDf` carry no signal and the index join is
    * near-linear after the cut. */
  def jaccardPairs(s: SparkSession, dir: String, threshold: Double = 0.85): DataFrame = {
    import graft.functions.ArrayOps.sortedIntersectCount
    // Pre-hash + sort each token set once; per-pair cost is then a
    // zero-allocation merge walk (SortedIntersectCount) instead of
    // array_intersect's per-pair hash-set build (~30x on this corpus).
    val toks = documents(s, dir).select(col("doc_id"),
      sort_array(array_distinct(transform(split(col("text"), " "), t => xxhash64(t))))
        .as("toks"))
      .withColumn("sz", size(col("toks")))
    // Size prefilter inside the join condition: J >= t forces
    // min(|A|,|B|)/max(|A|,|B|) >= t, two int ops that skip the merge walk
    // for the (57% here) pairs with dissimilar sizes. Expressed as a
    // division so boundary rounding matches the jaccard division itself.
    val sizeOk = least(col("a.sz"), col("b.sz")).cast("double") /
      greatest(col("a.sz"), col("b.sz")) >= threshold
    toks.as("a").join(broadcast(toks.as("b")),
        col("a.doc_id") < col("b.doc_id") && sizeOk)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        sortedIntersectCount(col("a.toks"), col("b.toks")).as("inter"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Inverted-index Jaccard (scale path; see [[jaccardPairs]]). */
  def jaccardPairsInverted(s: SparkSession, dir: String, threshold: Double = 0.85,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    val toks = tokenSet(s, dir)
    val filtered =
      if (maxDf == Long.MaxValue) toks
      else {
        val df = toks.groupBy("token").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf)
        toks.join(broadcast(df.select("token")), "token")
      }
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = filtered.as("a")
      .join(filtered.as("b"), col("a.token") === col("b.token")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes).as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures: k independent permutations approximated by
    * seeded xxhash64, folded into k min-aggregates in ONE shuffle. */
  def minhashSignatures(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val toks = tokenSet(s, dir)
    val mins = (0 until k).map(i =>
      min(xxhash64(lit(i), col("token"))).as(s"h$i"))
    toks.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding near-dup: signatures → b bands of r rows →
    * band-hash equi-join for candidates → signature-estimated Jaccard
    * (matching components / k) filter. Candidates only ever meet through
    * equal band hashes — never an all-pairs scan.
    *
    * Tuning: r = k/bands controls candidate selectivity — collision
    * probability per band is j^r, so r=8 (default) keeps near-all recall
    * at j≥0.9 (1-(1-0.9^8)^8 ≈ 0.99) while pruning the j≈0.6 bulk
    * (≈13% leak) that r=4 would admit wholesale. Band rows carry only
    * (doc_id, band, hash); the 64-long signatures are re-joined broadcast
    * AFTER pair dedup, so the candidate shuffle is 24 bytes/row. */
  def minhashPairs(s: SparkSession, dir: String, k: Int = 64, bands: Int = 8,
                   threshold: Double = 0.9): DataFrame = {
    import graft.functions.ArrayOps.positionalMatchCount
    val r = k / bands
    val sigs = minhashSignatures(s, dir, k)
    // localCheckpoint (not persist): materialized once, reused by the
    // band join + both broadcast re-joins, and reclaimed by the
    // ContextCleaner when unreferenced — a .persist here would leak cache
    // across the session since the operator never sees query completion.
    val sigArr = sigs.select(col("doc_id"),
      array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
      .localCheckpoint()
    val banded = sigArr.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bh")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .join(broadcast(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))), "doc_a")
      .join(broadcast(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (positionalMatchCount(col("sig_a"), col("sig_b")).cast("double") / k)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash fingerprints: 64-bit, token-hashed, one shuffle (64 signed
    * bit-sums folded in a single groupBy). */
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame = {
    val toks = tokenSet(s, dir).withColumn("h", xxhash64(col("token")))
    val sums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = toks.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val fp = (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
      acc.bitwiseOR(when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    }
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup: 16-bit-chunk pigeonhole join for candidates, then
    * exact Hamming distance via bit_count(xor). Pigeonhole is exact for
    * maxDist <= 3 (4 chunks); larger maxDist keeps the same candidate set
    * and is therefore recall-approximate (documented). */
  def simhashPairs(s: SparkSession, dir: String, maxDist: Int = 12): DataFrame = {
    val fps = simhashFingerprints(s, dir)
    val chunks = array((0 until 4).map(c =>
      shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = fps.select(col("doc_id"), col("simhash"),
      posexplode(chunks).as(Seq("chunk", "cv")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding cosine near-dup (brute pairs at test scale; the banded-LSH
    * scale path is [[Similarity.lshBuckets]]). Output is rank-free pairs
    * above a cosine threshold. */
  def embeddingPairs(s: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    import graft.functions.VectorFunctions._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("v"), norm(col("embedding")).as("nrm"))
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
