package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        | sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS i,
        | positional_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m,
        | positional_first_match(array(1L, 2L, 3L), array(9L, 2L, 3L)) AS f,
        | positional_first_match(array(1L, 2L), array(3L, 4L)) AS fn,
        | sorted_first_common(array(1L, 4L, 7L), array(2L, 4L, 9L)) AS c""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 11.0 && r.getInt(1) == 2 && r.getInt(2) == 2)
    assert(r.getInt(3) == 1 && r.isNullAt(4) && r.getLong(5) == 4L)

    val ed = spark.sql(
      """SELECT size(deletion_hashes(array(1L, 2L, 3L))) AS dh,
        | deletion_hashes(array(1L, 2L, 3L))[2] = deletion_hashes(array(1L, 3L))[0] AS dv,
        | word_edit_ops(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS sub,
        | word_edit_ops(array(1L, 2L, 3L), array(3L, 2L, 1L)) AS far""".stripMargin)
      .collect().head
    assert(ed.getInt(0) == 4 && ed.getBoolean(1))
    assert(ed.getInt(2) == 1 && ed.getInt(3) == 2)
  }

  test("kernel functions with static int params are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT sorted_run_stats(array(1L, 1L, 2L, 3L, 3L, 3L)) AS rs,
        | size(minhash_signature(array(10L, 20L, 30L), 16)) AS sk,
        | size(hashed_ngrams(array(1L, 2L, 3L, 4L), 3)) AS ng,
        | size(winnowing_mins(array(5L, 1L, 9L, 2L, 7L), 2)) AS wm""".stripMargin)
      .collect().head
    assert(r.getSeq[Long](0) == Seq(3L, 3L))
    assert(r.getInt(1) == 16 && r.getInt(2) == 2)
    assert(r.getInt(3) == 5) // one min per start position (tail windows truncate)
    // non-literal k is rejected with a clear error
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), CAST(rand() * 4 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("round-7 kernels: sorted_jaccard, span_join_except, py_repr_json from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L), 0.1D) AS j,
        | sorted_jaccard(array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L),
        |                array(11L, 12L), 0.9D) AS early,
        | span_join_except(array('a', 'b', 'c', 'd'), array(1, 3)) AS sp,
        | py_repr_json(to_json(array('10', '11'))) AS pr""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == -1.0) // threshold provably unreachable -> early exit
    assert(r.getString(2) == "a c")
    assert(r.getString(3) == "['10', '11']")
  }

  test("round-8 kernel: cut_covered from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cut_covered('abcdefghij', array(2, 5), 3) AS cut,
        | cut_covered('abcdefghij', cast(array() as array<int>), 3) AS whole""".stripMargin)
      .collect().head
    assert(r.getString(0) == "abij") // windows [2,5) and [5,8) cut c..h
    assert(r.getString(1) == "abcdefghij")
  }
}
