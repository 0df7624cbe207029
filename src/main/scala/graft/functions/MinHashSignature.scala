package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Whole MinHash signature in one codegen pass over a hashed token-set
  * array: for each of `k` seeded xxhash64 permutations, the minimum of
  * XXH64.hashLong(token, seed=i) over the array — ArrayType(LongType).
  *
  * Replaces the explode + 64-min-aggregate formulation: signatures become
  * a per-row projection (ZERO shuffle — the signature stage previously
  * paid a 600k-row explode plus a 64-column hash aggregate at sf0.1) and
  * each permutation hashes the pre-hashed 8-byte token instead of the
  * token string. k·|toks| tight-loop hashLong calls per row, no
  * allocation beyond the output array.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input and k > 0, got ${child.dataType} / k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    // NULL for an empty set: an all-MaxValue signature would band-collide
    // every pair of empty docs with est_jaccard 1.0 (true jaccard is
    // 0/0); a null signature drops out of banding at the posexplode. The
    // replaced explode+aggregate emitted no row for empty sets — same
    // outcome.
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val t = a.getLong(j)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(t, i.toLong)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(n, mins, i, j, t, h) =
        Seq("n", "mins", "i", "j", "t", "h").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $t = $a.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($t, (long) $i);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MinHashSignature {
  def minhashSignature(toks: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(toks), k))
}
