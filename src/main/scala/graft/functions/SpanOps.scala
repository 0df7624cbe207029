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

  /** Character-level span cut: rebuild `text` minus the union of
    * fixed-length-`L` windows starting at each of the ASCENDING-sorted
    * `starts` — one merge walk, O(len) per row. Positions are CODE
    * POINTS (not UTF-16 units), matching `Column.substr` / `length()` /
    * DuckDB `substr`, so the kernel, the anchor positions it consumes
    * and the SQL oracle all index the same way on non-ASCII text. */
  def cutCovered(text: UTF8String, starts: ArrayData, L: Int): UTF8String = {
    val cps = text.toString.codePoints().toArray
    val sb = new java.lang.StringBuilder(cps.length)
    var cur = 0
    var j = 0
    val m = starts.numElements()
    while (j < m) {
      val p = starts.getInt(j)
      var i = cur
      while (i < p) { sb.appendCodePoint(cps(i)); i += 1 }
      cur = math.max(cur, p + L)
      j += 1
    }
    var i = cur
    while (i < cps.length) { sb.appendCodePoint(cps(i)); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  def cutCoveredText(text: Column, starts: Column, L: Int): Column =
    ColumnBridge.column(SpanCutCovered(
      ColumnBridge.expression(text), ColumnBridge.expression(starts), L))
}

/** `cut_covered(text, sorted starts, L)` as one codegen merge walk over
  * (string, sorted array<int>); `L` is a plan-time literal. */
case class SpanCutCovered(left: Expression, right: Expression, L: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (string, array<int>), got $l / $r")
    }
  override def dataType: DataType = StringType

  override def nullSafeEval(l: Any, r: Any): Any =
    SpanOps.cutCovered(l.asInstanceOf[UTF8String], r.asInstanceOf[ArrayData], L)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpanOps.cutCovered($a, $b, $L);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
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
