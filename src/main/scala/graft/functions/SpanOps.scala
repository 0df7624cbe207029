package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Span-removal apply kernel: rebuild a document from its token array
  * minus an ASCENDING-sorted set of excluded positions, in ONE merge walk
  * — O(n + |covered|) per row. The generic formulation it replaces
  * (`filter(toks, (t, i) => !array_contains(covered, i))`) is an
  * interpreted HOF probing the covered array per token:
  * O(n · |covered|), quadratic on boilerplate-dominated corpora where
  * covered positions approach n (the upgrade path
  * [[graft.operators.Curation.removeSharedSpans]]'s round-6 comment
  * named). Tokens stay UTF8String end to end — no decode/re-encode.
  */
object SpanOps {
  /** Static per-row entry point the generated code calls. `covered` must
    * be ascending-sorted (the operator builds it with sort_array). */
  def joinExcept(toks: ArrayData, covered: ArrayData): UTF8String = {
    val n = toks.numElements()
    val m = covered.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    var j = 0
    while (i < n) {
      while (j < m && covered.getInt(j) < i) j += 1
      if (!(j < m && covered.getInt(j) == i))
        kept.add(toks.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }

  def joinTokensExcept(toks: Column, covered: Column): Column =
    ColumnBridge.column(SpanJoinExcept(
      ColumnBridge.expression(toks), ColumnBridge.expression(covered)))
}

/** `concat_ws(" ", tokens at positions NOT in covered)` as one codegen
  * merge walk over (array<string>, sorted array<int>). */
case class SpanJoinExcept(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (array<string>, array<int>), got $l / $r")
    }
  override def dataType: DataType = StringType

  override def nullSafeEval(l: Any, r: Any): Any =
    SpanOps.joinExcept(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpanOps.joinExcept($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
