package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's codegen expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works like any builtin.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * on the session builder, or call [[GraftExtensions.register]] on a live
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Whole-plan extensions (the DataFrame entry points also register
    // these per-session, so plain sessions work without this config).
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // Declarative row_number()<=k spelling → bounded-heap child.
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("sorted_intersect_count",
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted bigint arrays"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("positional_match_count",
      info("positional_match_count",
        "positional_match_count(a, b) - count of positions where two bigint arrays agree"),
      (args: Seq[Expression]) => PositionalMatchCount(args(0), args(1))),
    ("positional_first_match",
      info("positional_first_match",
        "positional_first_match(a, b) - first position (0-based) where two bigint arrays agree, NULL if none"),
      (args: Seq[Expression]) => PositionalFirstMatch(args(0), args(1))),
    ("sorted_first_common",
      info("sorted_first_common",
        "sorted_first_common(a, b) - smallest common element of two sorted bigint arrays, NULL if disjoint"),
      (args: Seq[Expression]) => SortedFirstCommon(args(0), args(1))),
    ("sorted_run_stats",
      info("sorted_run_stats",
        "sorted_run_stats(a) - [distinct count, max multiplicity] of a sorted bigint array in one walk"),
      (args: Seq[Expression]) => SortedRunStats(args(0))),
    ("minhash_signature",
      info("minhash_signature",
        "minhash_signature(toks, k) - k-component MinHash signature of a hashed-token bigint array (k a literal int)"),
      (args: Seq[Expression]) => MinHashSignature(args(0), foldableInt(args(1), "minhash_signature", "k"))),
    ("hashed_ngrams",
      info("hashed_ngrams",
        "hashed_ngrams(toks, n) - chained n-gram hashes of a hashed-token bigint array, short inputs padded to one gram (n a literal int)"),
      (args: Seq[Expression]) => HashedNGrams(args(0), foldableInt(args(1), "hashed_ngrams", "n"))),
    ("winnowing_mins",
      info("winnowing_mins",
        "winnowing_mins(grams, w) - minimum over the window of w gram hashes starting at each position, one output per position (w a literal int)"),
      (args: Seq[Expression]) => WinnowingMins(args(0), foldableInt(args(1), "winnowing_mins", "w"))),
    ("deletion_hashes",
      info("deletion_hashes",
        "deletion_hashes(toks) - [full-sequence hash, hash of sequence minus element i...] of a hashed-token bigint array (n+1 outputs, one O(n) pass)"),
      (args: Seq[Expression]) => DeletionHashes(args(0))),
    ("word_edit_ops",
      info("word_edit_ops",
        "word_edit_ops(a, b) - min(Levenshtein distance, 2) of two bigint sequences in one prefix/suffix pass"),
      (args: Seq[Expression]) => WordEditOps(args(0), args(1))),
    ("sorted_jaccard",
      info("sorted_jaccard",
        "sorted_jaccard(a, b, t) - jaccard of two sorted bigint arrays in one merge walk, -1.0 as soon as the t threshold is provably unreachable (t a literal double)"),
      (args: Seq[Expression]) =>
        SortedJaccard(args(0), args(1),
          foldableDouble(args(2), "sorted_jaccard", "t"))),
    ("span_join_except",
      info("span_join_except",
        "span_join_except(toks, covered) - tokens whose 0-based position is NOT in the sorted covered-position array, one merge walk"),
      (args: Seq[Expression]) => SpanJoinExcept(args(0), args(1))),
    ("py_repr_json",
      info("py_repr_json",
        "py_repr_json(j) - Python str() rendering of a JSON array/scalar string (the reference's list stringification)"),
      (args: Seq[Expression]) => PyReprJson(args(0))),
    ("cut_covered",
      info("cut_covered",
        "cut_covered(text, starts, L) - text minus the union of L-code-point windows at the sorted starts, one merge walk (L a literal int)"),
      (args: Seq[Expression]) => SpanCutCovered(args(0), args(1),
        foldableInt(args(2), "cut_covered", "L"))))

  /** Static int parameters (k, n, w) must be literals at parse time — the
    * kernels specialize their generated loops on them. */
  private def foldableInt(e: Expression, fn: String, param: String): Int = {
    require(e.foldable, s"$fn: $param must be a literal integer")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be a literal integer, got $other")
    }
  }

  private def foldableDouble(e: Expression, fn: String, param: String): Double = {
    require(e.foldable, s"$fn: $param must be a literal double")
    e.eval() match {
      case d: Double => d
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be a literal double, got $other")
    }
  }

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
