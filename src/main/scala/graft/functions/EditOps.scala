package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen kernels for the word-level edit-distance dedup
  * ([[graft.operators.Dedup.editPairs]]) — the order-SENSITIVE
  * complement to the set-based jaccard/minhash family.
  *
  * Candidate scheme (SymSpell / FastSS deletion neighborhoods): two token
  * sequences within word edit distance 1 must share an element of each
  * other's {full sequence} ∪ {sequence minus one token} hash sets —
  * substitution at i ⇒ both deletion-at-i variants coincide; an
  * insert/delete ⇒ one side's full hash equals the other's deletion
  * variant; equality ⇒ full hashes coincide. Recall is therefore exact
  * (determinism of the hash), and precision is restored by the exact
  * [[WordEditOps]] verify, so hash collisions only ever cost candidates.
  */

/** All n+1 deletion-neighborhood hashes of a token-hash sequence in ONE
  * O(n) pass: out(0) = hash of the full sequence, out(i+1) = hash of the
  * sequence with element i removed.
  *
  * The naive formulation rehashes a length-(n−1) slice per variant —
  * O(n²) work per document, which at 1k-token documents is 10⁶ hash ops
  * per row. Instead each sequence maps to a polynomial Σ tⱼ·Bʲ (mod 2⁶⁴,
  * B odd), which deletion splits into prefix + shifted suffix:
  * poly(minus i) = P(i) + Bⁱ·S(i+1) with P/S one prefix and one suffix
  * sweep. A final XXH64 avalanche seeded with the variant LENGTH both
  * destroys the polynomial structure and separates sequences that are
  * deletion-chains of each other. Equal sequences always hash equal, so
  * the candidate join's recall does not depend on collision behavior. */
case class DeletionHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val B = DeletionHashes.Base
    val suf = new Array[Long](n + 1) // suf(i) = Σ_{j>=i} t_j B^(j-i)
    var i = n - 1
    while (i >= 0) { suf(i) = a.getLong(i) + B * suf(i + 1); i -= 1 }
    val out = new Array[Long](n + 1)
    out(0) = XXH64.hashLong(suf(0), n.toLong)
    var pre = 0L  // Σ_{j<i} t_j B^j
    var pow = 1L  // B^i
    i = 0
    while (i < n) {
      out(i + 1) = XXH64.hashLong(pre + pow * suf(i + 1), (n - 1).toLong)
      pre += pow * a.getLong(i)
      pow *= B
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(n, suf, out, i, pre, pow) =
        Seq("n", "suf", "out", "i", "pre", "pow").map(ctx.freshName)
      val B = s"${DeletionHashes.Base}L"
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |long[] $suf = new long[$n + 1];
         |for (int $i = $n - 1; $i >= 0; $i--) {
         |  $suf[$i] = $a.getLong($i) + $B * $suf[$i + 1];
         |}
         |long[] $out = new long[$n + 1];
         |$out[0] = $xxh.hashLong($suf[0], (long) $n);
         |long $pre = 0L;
         |long $pow = 1L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i + 1] = $xxh.hashLong($pre + $pow * $suf[$i + 1], (long) ($n - 1));
         |  $pre += $pow * $a.getLong($i);
         |  $pow *= $B;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object DeletionHashes {
  /** Odd multiplier (2⁶⁴ golden ratio) — invertible mod 2⁶⁴, so the
    * polynomial map over fixed length is a bijection per coefficient. */
  val Base: Long = 0x9E3779B97F4A7C15L
}

/** min(word-level Levenshtein distance, 2) of two long sequences in one
  * prefix/suffix pass — O(n) and allocation-free, vs O(n·k) banded DP.
  * Valid because the caller only discriminates {0, 1, >1}: after
  * stripping the longest common prefix `pre` and the longest common
  * suffix that does not overlap it, the residual windows have lengths
  * (wa, wb) with wb − wa = len(b) − len(a), and ed ≤ 1 ⟺ max(wa, wb) ≤ 1
  * (equal ⟺ both empty; substitution ⟺ (1,1); insert/delete ⟺ (0,1)). */
case class WordEditOps(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val la = a.numElements(); val lb = b.numElements()
    if (math.abs(la - lb) > 1) return 2
    var i = 0
    val mn = math.min(la, lb)
    while (i < mn && a.getLong(i) == b.getLong(i)) i += 1
    var ja = la - 1; var jb = lb - 1
    while (ja >= i && jb >= i && a.getLong(ja) == b.getLong(jb)) { ja -= 1; jb -= 1 }
    val w = math.max(ja - i + 1, jb - i + 1)
    if (w <= 0) 0 else if (w == 1) 1 else 2
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(la, lb, i, mn, ja, jb, w) =
        Seq("la", "lb", "i", "mn", "ja", "jb", "w").map(ctx.freshName)
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |if (java.lang.Math.abs($la - $lb) > 1) {
         |  ${ev.value} = 2;
         |} else {
         |  int $i = 0;
         |  int $mn = java.lang.Math.min($la, $lb);
         |  while ($i < $mn && $a.getLong($i) == $b.getLong($i)) $i++;
         |  int $ja = $la - 1;
         |  int $jb = $lb - 1;
         |  while ($ja >= $i && $jb >= $i && $a.getLong($ja) == $b.getLong($jb)) { $ja--; $jb--; }
         |  int $w = java.lang.Math.max($ja - $i + 1, $jb - $i + 1);
         |  ${ev.value} = $w <= 0 ? 0 : ($w == 1 ? 1 : 2);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object EditOps {
  def deletionHashes(toks: Column): Column =
    ColumnBridge.column(DeletionHashes(ColumnBridge.expression(toks)))
  def wordEditOps(a: Column, b: Column): Column =
    ColumnBridge.column(WordEditOps(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
