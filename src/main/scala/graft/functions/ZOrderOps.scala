package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) curve value for two integer keys — the data-layout
  * primitive behind multi-dimensional clustering (see
  * [[graft.operators.Layout]]).
  *
  * Interleaves the low 32 bits of the two keys bit-by-bit
  * (`a₃₁ b₃₁ a₃₀ b₃₀ …`), so rows close in BOTH key dimensions land close
  * on the 1-D curve. Sorting a table by this value clusters every
  * dimension at once, which is what makes parquet row-group min/max
  * pruning effective for 2-D range predicates — a single-column sort
  * clusters only its own column and leaves the other dimension's
  * min/max spanning the whole domain (measured: tools/MeasureZOrder).
  *
  * The bit spread is the classic mask-shift cascade (public-domain
  * bit-twiddling; cf. the "Interleave bits by Binary Magic Numbers"
  * construction), emitted inline by `doGenCode` so layout writes stay
  * inside WholeStageCodegen.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case LongType | IntegerType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"z_value expects integral keys, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int  => i.toLong
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrderOps.interleave(asLong(l), asLong(r))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      // same cascade as ZOrderOps.spread, inlined for codegen
      def spread(in: String, out: String): String =
        s"""
           |long $out = ((long) $in) & 0xffffffffL;
           |$out = ($out | ($out << 16)) & 0x0000ffff0000ffffL;
           |$out = ($out | ($out << 8))  & 0x00ff00ff00ff00ffL;
           |$out = ($out | ($out << 4))  & 0x0f0f0f0f0f0f0f0fL;
           |$out = ($out | ($out << 2))  & 0x3333333333333333L;
           |$out = ($out | ($out << 1))  & 0x5555555555555555L;
         """.stripMargin
      s"""
         |${spread(a, sa)}
         |${spread(b, sb)}
         |${ev.value} = ($sa << 1) | $sb;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderOps {
  /** Spread the low 32 bits of `x` into the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton interleave of the low 32 bits of `a` (odd positions) and
    * `b` (even positions). */
  def interleave(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)

  /** Column-API entry point. */
  def zvalue(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZValue(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
