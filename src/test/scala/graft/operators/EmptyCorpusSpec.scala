package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empty-corpus robustness: a pipeline stage fed zero rows (an
  * aggressive upstream filter, a quiet ingest day) must return an EMPTY
  * RESULT, not throw — the degenerate case every nightly job eventually
  * hits. Operators with trained control-plane state (ANN codebooks) are
  * exempt by contract: training on nothing is a caller error and should
  * fail loudly, which is why they are absent here. */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-empty").toString
    import spark.implicits._
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.exact(spark, dir).count() == 0)
    assert(Dedup.jaccardPairs(spark, dir).count() == 0)
    assert(Dedup.substrDupSpans(spark, dir).count() == 0)
    assert(Dedup.editPairs(spark, dir).count() == 0)
    assert(Dedup.incrementalExact(spark, dir).count() == 0)
    // the auto ordering decision must survive a zero-row sample (null
    // aggregate) and fall back to hash order, and the auto join itself
    // must return empty, not throw
    assert(!Dedup.chooseRarestPrefix(spark, dir, 0.95))
    assert(Dedup.containmentPairs(spark, dir).count() == 0)
  }

  test("text / search / profiling families return empty on an empty corpus") {
    assert(TextAnalysis.dupGramStats(spark, dir).count() == 0)
    assert(TextAnalysis.vocabTopK(spark, dir).count() == 0)
    assert(TextAnalysis.boilerplate(spark, dir).count() == 0)
    assert(Search.invertedIndex(spark, dir).count() == 0)
    assert(Profiling.tokenDrift(spark, dir).count() == 0)
    assert(Curation.cutDuplicatedSubstrings(spark, dir).count() == 0)
    // the column profiler still reports one row per column, all zeros
    val p = Profiling.columnProfile(Tables.documents(spark, dir)).collect()
    assert(p.length == 5 && p.forall(r => r.getLong(1) == 0 && r.getLong(3) == 0))
  }

  test("round-10 additions return empty / no merges on an empty corpus") {
    // auto blockSize: max(doc_id) over zero rows is NULL -> handled
    assert(Curation.packSequences(spark, dir).count() == 0)
    // the capstone: every stage fed zero rows
    assert(DocPipeline.exportTraining(spark, dir).count() == 0)
    // distributed trainer: empty vocabulary -> zero merges, not a crash
    assert(Tokenizer.learnMergesDistributed(spark, dir, nMerges = 8).isEmpty)
    assert(Tokenizer.learnMergesIncremental(spark, dir, nMerges = 8).isEmpty)
    // sketch gate: per-column rows survive, 0-vs-0 counts agree
    val sk = Profiling.sketchProfile(Tables.documents(spark, dir)).collect()
    assert(sk.length == 5 && sk.forall(r => r.getLong(1) == 0 && r.getBoolean(2)))
    assert(Curation.urlNormDemo(spark, dir).count() == 0)
  }

  test("round-14 text additions return empty on an empty corpus") {
    // span spine over zero docs -> zero segments, not a throw
    assert(TextAnalysis.languageSpans(spark, dir).count() == 0)
    // fertility: the languageId join defines membership -> zero rows
    assert(TextAnalysis.subwordFertility(spark, dir).count() == 0)
  }
}
