package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Approximate-membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` — the control-plane
  * prefilter a 100-TB incremental dedup runs before touching the corpus
  * join: one-sided error (no false negatives), so a negative probe is a
  * PROOF of absence and only the positives pay the exact check.
  *
  * The filter rides into generated code as a reference object (the
  * [[PqOps]] codebook precedent) — `mightContainLong` is a few hashes
  * and bit probes inline in WholeStageCodegen, no UDF boundary, no
  * per-row serialization. Spark's sketch BloomFilter is deterministic
  * (fixed seeds), so plans built from the same corpus probe
  * identically on every executor and every run. */
object BloomOps {
  def mightContain(c: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(c), bf))
}

/** `bf.mightContainLong(child)` for a BIGINT child. */
case class BloomMightContainLong(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected bigint, got $other")
  }
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
