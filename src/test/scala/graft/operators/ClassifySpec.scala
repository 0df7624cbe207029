package graft.operators

import java.nio.file.Files
import graft.SparkSpec

class ClassifySpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-classify").toString
    import spark.implicits._
    // two well-separated vocabularies plus one doc of mixed-but-majority
    // terms per class; every doc should come back predicted as its own
    // source
    Seq(
      (0L, "spark shuffle partition executor stage task", "en", "eng", 1L),
      (1L, "executor stage spark task partition shuffle shuffle", "en", "eng", 1L),
      (2L, "recipe flour butter sugar oven bake", "en", "food", 1L),
      (3L, "bake oven sugar flour recipe recipe butter", "en", "food", 1L),
      (4L, "spark task oven executor stage partition", "en", "eng", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("centroid classifier recovers the planted classes") {
    val rows = Classify.centroidClassify(spark, dir).collect()
    assert(rows.length == 5)
    val byId = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(0L -> "eng", 1L -> "eng", 2L -> "food",
                       3L -> "food", 4L -> "eng"))
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("classifier scores are reproducible integers (same result twice)") {
    val a = Classify.centroidClassify(spark, dir).collect().toSeq
    val b = Classify.centroidClassify(spark, dir).collect().toSeq
    assert(a == b)
  }
}
