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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
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
      (args: Seq[Expression]) => SortedFirstCommon(args(0), args(1))))

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
