package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen kernels for the n-gram / winnowing pipeline. The previous
  * formulation built a STRING per gram (`concat_ws` over a token slice,
  * then xxhash64) inside an interpreted `transform` — one allocation and
  * one string hash per gram per row. These kernels run one tight pass
  * over the per-row pre-hashed token array. Gram identity changes from
  * hash(gram string) to a chained hash of the token hashes; every
  * oracle-checked quantity (gram-set jaccard, shared-gram counts,
  * fingerprint-count bounds) is invariant under any injective gram hash.
  */

/** Hashes of all word n-grams, in sequence order: output[i] =
  * XXH64 chain over tokens[i .. min(i+n, len)-1]. Output length
  * max(len - n + 1, 1) — documents shorter than n yield one gram over
  * what is there, matching the transform/slice formulation. */
case class HashedNGrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input and n > 0, got ${child.dataType} / n=$n")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    val m = math.max(len - n + 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 42L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) { h = XXH64.hashLong(a.getLong(j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(len, m, out, i, j, end, h) =
        Seq("len", "m", "out", "i", "j", "end", "h").map(ctx.freshName)
      s"""
         |int $len = $a.numElements();
         |int $m = java.lang.Math.max($len - $n + 1, 1);
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 42L;
         |  int $end = java.lang.Math.min($i + $n, $len);
         |  for (int $j = $i; $j < $end; $j++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($a.getLong($j), $h);
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Sliding-window minima: output[i] = min(input[i .. min(i+w, len)-1])
  * for every i — the winnowing window pass (windows shorten at the
  * tail, matching the transform/slice formulation). O(len·w) with w=4;
  * no allocation beyond the output. */
case class WinnowingMins(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input and w > 0, got ${child.dataType} / w=$w")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    val out = new Array[Long](len)
    var i = 0
    while (i < len) {
      var mn = Long.MaxValue
      var j = i
      val end = math.min(i + w, len)
      while (j < end) { val v = a.getLong(j); if (v < mn) mn = v; j += 1 }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(len, out, i, j, end, mn, v) =
        Seq("len", "out", "i", "j", "end", "mn", "v").map(ctx.freshName)
      s"""
         |int $len = $a.numElements();
         |long[] $out = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  long $mn = Long.MAX_VALUE;
         |  int $end = java.lang.Math.min($i + $w, $len);
         |  for (int $j = $i; $j < $end; $j++) {
         |    long $v = $a.getLong($j);
         |    if ($v < $mn) $mn = $v;
         |  }
         |  $out[$i] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object NGramOps {
  def hashedNGrams(toks: Column, n: Int): Column =
    ColumnBridge.column(HashedNGrams(ColumnBridge.expression(toks), n))
  def winnowingMins(grams: Column, w: Int): Column =
    ColumnBridge.column(WinnowingMins(ColumnBridge.expression(grams), w))
}
