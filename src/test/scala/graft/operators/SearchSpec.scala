package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("inverted index: postings sorted ascending and capped; df counts memberships") {
    val cap = 5
    val rows = Search.invertedIndex(spark, sf, cap = cap).collect()
    assert(rows.nonEmpty)
    val memberships = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (term, df, postings) = (r.getString(0), r.getLong(1), r.getString(2))
      assert(df == memberships(term))
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted)
      assert(ids.length == math.min(df, cap.toLong))
      assert(ids.distinct.length == ids.length)
    }
  }

  test("maintained index is bit-identical to the fresh full rebuild (sf0.001)") {
    // cap = 2 forces the merge to exercise the min-k-under-union rule
    // (both sides capped, merged list re-capped), not just concatenation.
    for (cap <- Seq(2, 64)) {
      val fresh = Search.invertedIndex(spark, sf, cap = cap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      val kept = Search.incrementalIndex(spark, sf, cap = cap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      assert(kept.toSeq == fresh.toSeq, s"cap=$cap")
    }
    // The split must be non-trivial: terms exist on both sides.
    val inc = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0).count()
    val settled = Tables.documents(spark, sf).filter(col("doc_id") % 10 =!= 0).count()
    assert(inc > 0 && settled > 0)
  }

  test("tfidf top-k: ranks 1..k, scores non-increasing, hits contain a query term") {
    val top = Search.tfidfTopK(spark, sf, nTerms = 3, topK = 10).collect()
    assert(top.length == 10)
    assert(top.map(_.getLong(2)).toSeq == (1L to 10L))
    val scores = top.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // the three rarest terms, recomputed independently
    val rare = Tables.documents(spark, sf)
      .select(explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy("term").count()
      .orderBy(col("count").asc, col("term").asc).limit(3)
      .collect().map(_.getString(0)).toSet
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    top.foreach { r =>
      val words = texts(r.getLong(0)).split(" ").toSet
      assert(words.intersect(rare).nonEmpty)
    }
  }

  test("phrase search: every hit contains the top bigram exactly n_occurrences times") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // top bigram recomputed independently (count desc, bigram asc)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.values.foreach { t =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .foreach(p => counts(p.mkString(" ")) = counts.getOrElse(p.mkString(" "), 0L) + 1)
    }
    val phrase = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }.head._1
    val expected = docs.flatMap { case (id, t) =>
      val n = t.split(" ").sliding(2).count(_.mkString(" ") == phrase)
      if (n > 0) Some(id -> n.toLong) else None
    }
    val got = Search.phraseSearch(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("bm25 top-k: ranks and scores match a BigInt recomputation of the formula") {
    val top = Search.bm25TopK(spark, sf, nTerms = 3, topK = 10).collect()
    assert(top.length == 10)
    assert(top.map(_.getLong(2)).toSeq == (1L to 10L))
    // full independent recomputation in arbitrary precision
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = BigInt(texts.size)
    val sLen = BigInt(texts.values.map(_.length.toLong).sum)
    val df = texts.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, o) => t -> BigInt(o.size) }
    val rare = df.toSeq.sortBy { case (t, d) => (d, t) }.take(3)
    val expected = texts.map { case (id, toks) =>
      val dl = BigInt(toks.length)
      id -> rare.map { case (term, d) =>
        val tf = BigInt(toks.count(_ == term))
        if (tf == 0) BigInt(0)
        else {
          val idf = ((2 * n - 2 * d + 1) * 1000000) / (2 * d + 1)
          val sat = (1000000 * 36 * tf * sLen) /
            (16 * tf * sLen + 5 * sLen + 15 * dl * n)
          (idf * sat) / 1000000
        }
      }.sum
    }
    top.foreach(r => assert(BigInt(r.getLong(1)) == expected(r.getLong(0))))
    val trueTop = expected.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(10).map(_._1)
    assert(top.map(_.getLong(0)).toSeq == trueTop)
  }

  test("hybrid search: cosine re-rank of the BM25 candidate set, query doc excluded") {
    val nCand = 20
    val got = Search.hybridSearch(spark, sf, nCand = nCand, topK = 10).collect()
    assert(got.map(_.getLong(2)).toSeq == (1L to got.length.toLong))
    val cands = Search.bm25TopK(spark, sf, topK = nCand).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val qDoc = cands.collectFirst { case (id, (_, 1L)) => id }.get
    // results come from the candidate set minus the query doc, and carry
    // the candidate's lexical score unchanged
    got.foreach { r =>
      assert(r.getLong(0) != qDoc)
      assert(cands(r.getLong(0))._1 == r.getLong(1))
    }
    // rank order equals an independent double-precision cosine ordering
    // vs the query doc's embedding (id tiebreak)
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qv = vecs(qDoc)
    val expected = (cands.keySet - qDoc).toSeq
      .map(id => id -> cos(vecs(id), qv))
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == expected)
  }

  test("RRF: fused ranks match an independent integer recomputation") {
    val got = Search.rrfSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._5).toSeq == (1L to got.length.toLong) && got.length == 10)
    val cands = Search.bm25TopK(spark, sf, topK = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc -> bm25 rank
    val qDoc = cands.collectFirst { case (id, 1L) => id }.get
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qv = vecs(qDoc)
    val cosRank = (cands.keySet - qDoc).toSeq
      .map(id => id -> cos(vecs(id), qv))
      .sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = cosRank.keys.toSeq
      .map { id =>
        val f = 1000000000L / (60 + cands(id)) + 1000000000L / (60 + cosRank(id))
        (id, cands(id), cosRank(id), f)
      }
      .sortBy { case (id, _, _, f) => (-f, id) }.take(10)
      .zipWithIndex.map { case ((id, b, c, f), i) => (id, b, c, f, i + 1L) }
    assert(got.toSeq == expected, s"got ${got.take(3).toSeq}")
  }

  test("MMR: selection matches an independent recomputation of the greedy") {
    val sf = "/root/testdata/sf0.001"
    val got = Search.mmrTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.length == 10)
    assert(got.map(_._1) == (1L to 10L))
    assert(got.map(_._2).distinct.size == 10)
    // max marginal relevance is non-increasing in k: the step-k pick was
    // available at step k-1 with weakly higher marginal
    val scores = got.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // independent recomputation: candidate relevance from bm25TopK's
    // (already independently pinned) output, similarity and the greedy
    // itself redone here in BigInt arithmetic
    val cands = Search.bm25TopK(spark, sf, topK = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    val maxScore = cands.values.max
    val rel = cands.map { case (id, sc) =>
      id -> (BigInt(sc) * 1000000 / BigInt(maxScore)).toLong
    }
    def sim(a: Long, b: Long): Long = {
      val (x, y) = (toks(a), toks(b))
      val inter = (x & y).size.toLong
      val union = x.size + y.size - inter
      if (union == 0) 0L else inter * 1000000L / union
    }
    var sel = Vector.empty[(Long, Long)]
    var rem = rel.keySet
    while (sel.size < 10) {
      val best = rem.toSeq.map { id =>
        val red = if (sel.isEmpty) 0L else sel.map(s => sim(id, s._1)).max
        (id, rel(id) - red)
      }.minBy { case (id, m) => (-m, id) }
      sel :+= best
      rem -= best._1
    }
    val expected = sel.zipWithIndex.map { case ((id, m), i) => (i + 1L, id, m) }
    assert(got == expected)
  }
}
