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

  test("knn label propagation: votes match an independent driver replay") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
        col("doc_id") === col("vec_id"))
      .select("vec_id", "embedding", "lang").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getString(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val seeds = e.filter(_._1 % 5 == 0)
    val expected = e.filter(_._1 % 5 != 0).map { case (id, v, _) =>
      val top = seeds.map { case (sid, sv, sl) => (cos(v, sv), sid, sl) }
        .sortBy { case (c, sid, _) => (-c, sid) }.take(5)
      val (lab, n) = top.groupBy(_._3).map { case (l, g) => (l, g.length) }
        .toSeq.sortBy { case (l, nn) => (-nn, l) }.head
      (id, lab, n.toLong)
    }.sortBy(_._1)
    val got = Classify.knnLabelPropagation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq, s"got ${got.take(3).toSeq}")
    // every target labeled exactly once; votes bounded by k
    assert(got.length == e.count(_._1 % 5 != 0))
    assert(got.forall(t => t._3 >= 1 && t._3 <= 5))
  }
}
