package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction over the corpus — the missing step between
  * "raw text" and "token budget" in an LLM data pipeline (Sennrich et
  * al. 2016; the GPT-2/RoBERTa training recipe).
  *
  * Production shape, mirrored here: merge rules are learned from the
  * WORD-FREQUENCY table, not the corpus — one distributed word-count
  * shuffle, then a BOUNDED TakeOrdered collect of the top `vocabCap`
  * words (at 100 TB the word table is huge but its frequency mass is
  * Zipfian; capping the trainer's vocabulary is what every production
  * BPE trainer does), then the classic merge loop on the driver — the
  * same control-plane pattern as the IVF/PQ codebooks. The learned
  * table is broadcast back inside ONE kernel expression
  * ([[graft.functions.BpeTokenCount]]), so the corpus-scale APPLY is a
  * zero-exchange projection that stays in WholeStageCodegen.
  */
object Tokenizer {
  import Tables.documents

  /** Learn `nMerges` BPE merges from the corpus's top-`vocabCap` words.
    * Deterministic: vocabulary ordered (count desc, word asc); pair ties
    * break lexicographically. Trainer rewrites its vocabulary with the
    * SAME [[graft.functions.BpeOps.applyMerges]] the kernel uses. */
  def learnMerges(s: SparkSession, dir: String, nMerges: Int = 32,
                  vocabCap: Int = 4096): Seq[(String, String)] = {
    val vocab: Array[(Array[String], Long)] = documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var words = vocab
    var it = 0
    while (it < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) it = nMerges
      else {
        // max count, ties -> lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val ranks = graft.functions.BpeOps.ranksOf(merges.toSeq)
        // re-segment the vocab from characters under the FULL table —
        // identical semantics to what the kernel applies per row
        words = vocab.map { case (chars, c) =>
          (graft.functions.BpeOps.applyMerges(chars, ranks), c)
        }
        it += 1
      }
    }
    merges.toSeq
  }

  /** Per-document BPE stats under the learned table: pre-merge symbol
    * count (characters excluding separators), post-merge token count,
    * whitespace word count. The apply is one kernel expression in the
    * scan — no exchange. */
  def bpeStats(s: SparkSession, dir: String, nMerges: Int = 32,
               vocabCap: Int = 4096): DataFrame = {
    val merges = learnMerges(s, dir, nMerges, vocabCap)
    val toks = split(col("text"), " ")
    documents(s, dir).select(
      col("doc_id"),
      (length(col("text")) - (size(toks) - 1)).cast("long").as("n_symbols"),
      graft.functions.BpeOps.bpeTokenCount(col("text"), merges)
        .cast("long").as("n_bpe_tokens"),
      // NON-EMPTY words only, matching the kernel's nonEmpty skip:
      // consecutive/leading/trailing spaces split into empty strings that
      // produce no BPE token, and counting them made the [n_words,
      // n_symbols] bounds check spuriously fail on such texts.
      size(filter(toks, t => length(t) > 0)).cast("long").as("n_words"))
      .orderBy("doc_id")
  }
}
