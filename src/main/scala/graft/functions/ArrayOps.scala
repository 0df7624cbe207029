package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd primitive array<long> comparisons for the dedup operators.
  * Same rationale as [[DotProduct]]: Spark's generic array builtins
  * (`array_intersect`, `zip_with`) allocate/box per pair, which dominates
  * candidate-verification scans of millions of pairs; these emit tight
  * long-loops inside WholeStageCodegen.
  */
private[graft] trait LongArrayBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = IntegerType
}

/** Count of positions where two equal-length long arrays agree —
  * the MinHash signature-match estimator's kernel. */
case class PositionalMatchCount(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var m = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) m += 1; i += 1 }
    m
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, m) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("m"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Intersection size of two ASCENDING-sorted long arrays via a merge walk
  * — O(|a|+|b|) with no allocation, the kernel for exact token-set
  * Jaccard over pre-hashed, pre-sorted token arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var m = 0
    val (na, nb) = (a.numElements(), b.numElements())
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { m += 1; i += 1; j += 1 }
      else if (x < y) i += 1 else j += 1
    }
    m
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, j, m, na, nb, x, y) =
        Seq("i", "j", "m", "na", "nb", "x", "y").map(ctx.freshName)
      s"""
         |int $i = 0; int $j = 0; int $m = 0;
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $m++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $m;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Exact Jaccard of two ASCENDING-sorted distinct long arrays in ONE
  * merge walk, with a provable early exit for pairs that cannot reach
  * `threshold`: [[SortedIntersectCount]] spelled into the jaccard
  * division appears TWICE in a join condition (numerator + denominator),
  * so every candidate paid the walk twice; this kernel walks once and
  * returns the IEEE-identical value `(double) m / (na + nb - m)`.
  *
  * Early exit: the minimal passing intersection I* (smallest integer
  * with I/(na+nb−I) ≥ t under the SAME double arithmetic) is found by
  * binary search up front — ~6 integer steps — and the walk aborts with
  * −1.0 the moment `m + min(remaining_a, remaining_b) < I*`, an
  * integer-only test. −1.0 fails every `>= t` the callers apply exactly
  * like the true sub-threshold value would; pairs that PASS always
  * complete the walk, so emitted values are bit-identical to the
  * two-kernel spelling. */
case class SortedJaccard(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    val maxI = math.min(na, nb)
    // smallest I with I/(na+nb-I) >= t, or maxI+1 if unreachable
    var lo = 0; var hi = maxI + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (mid.toDouble / (na + nb - mid) >= threshold) hi = mid else lo = mid + 1
    }
    val istar = lo
    if (istar > maxI) return -1.0
    var i = 0; var j = 0; var m = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { m += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        if (m + math.min(na - i, nb - j) < istar) return -1.0
      }
    }
    m.toDouble / (na + nb - m)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, j, m, na, nb, x, y, lo, hi, mid, istar, done) =
        Seq("i", "j", "m", "na", "nb", "x", "y", "lo", "hi", "mid", "istar", "done")
          .map(ctx.freshName)
      val t = threshold.toString
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $lo = 0; int $hi = java.lang.Math.min($na, $nb) + 1;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ((double) $mid / ($na + $nb - $mid) >= $t) { $hi = $mid; } else { $lo = $mid + 1; }
         |}
         |int $istar = $lo;
         |boolean $done = false;
         |${ev.value} = -1.0;
         |int $i = 0; int $j = 0; int $m = 0;
         |if ($istar > java.lang.Math.min($na, $nb)) { $done = true; $m = -1; }
         |while (!$done && $i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $m++; $i++; $j++; }
         |  else {
         |    if ($x < $y) { $i++; } else { $j++; }
         |    if ($m + java.lang.Math.min($na - $i, $nb - $j) < $istar) { $done = true; $m = -1; }
         |  }
         |}
         |if ($m >= 0) { ${ev.value} = (double) $m / ($na + $nb - $m); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** First (minimum) common element of two ASCENDING-sorted long arrays via
  * a merge walk; NULL when disjoint. Lets a prefix-filter self-join emit
  * each candidate pair exactly once (join token == first shared prefix
  * token) without a post-hoc dropDuplicates shuffle — `array_intersect`
  * builds a hash set per invocation, which measured ~10x slower across a
  * multi-million-row candidate stream. */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0
    val (na, nb) = (a.numElements(), b.numElements())
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) return x
      else if (x < y) i += 1 else j += 1
    }
    null
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, j, na, nb, x, y) =
        Seq("i", "j", "na", "nb", "x", "y").map(ctx.freshName)
      s"""
         |int $i = 0; int $j = 0;
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |${ev.isNull} = true;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.isNull} = false; ${ev.value} = $x; break; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** First index (0-based) where two equal-length long arrays agree
  * positionally; NULL when none. The banded-LSH twin of
  * [[SortedFirstCommon]]: requiring the joined band index to equal the
  * FIRST agreeing band makes each candidate pair survive the band
  * self-join exactly once, with no dropDuplicates exchange over the raw
  * match stream (a very similar pair matches in most of its b bands).
  * The zip_with + array_position spelling of the same predicate is not
  * codegen'd and allocates a boolean array per raw match — this kernel
  * is a tight loop inside the join's generated code. */
case class PositionalFirstMatch(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) return i; i += 1 }
    null
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.isNull} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) {
         |    ${ev.isNull} = false; ${ev.value} = $i; break;
         |  }
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Run statistics over an ASCENDING-sorted long array in one pass:
  * output[0] = number of runs (= distinct elements), output[1] = longest
  * run (= max multiplicity). Feeds the repetition quality signals
  * (type-token ratio, top-word share) without building the per-element
  * hash sets an `array_distinct` + per-distinct `filter` spelling would
  * allocate. Empty input → [0, 0]. */
case class SortedRunStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var runs = 0L; var maxRun = 0L; var cur = 0L
    var i = 0
    while (i < n) {
      if (i == 0 || a.getLong(i) != a.getLong(i - 1)) { runs += 1; cur = 1 }
      else cur += 1
      if (cur > maxRun) maxRun = cur
      i += 1
    }
    new GenericArrayData(Array(runs, maxRun))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(n, runs, maxRun, cur, i) =
        Seq("n", "runs", "maxRun", "cur", "i").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |long $runs = 0L; long $maxRun = 0L; long $cur = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i == 0 || $a.getLong($i) != $a.getLong($i - 1)) {
         |    $runs++; $cur = 1L;
         |  } else { $cur++; }
         |  if ($cur > $maxRun) $maxRun = $cur;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[] { $runs, $maxRun });
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ArrayOps {
  def sortedRunStats(a: Column): Column =
    ColumnBridge.column(SortedRunStats(ColumnBridge.expression(a)))

  def positionalFirstMatch(a: Column, b: Column): Column =
    ColumnBridge.column(PositionalFirstMatch(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedFirstCommon(a: Column, b: Column): Column =
    ColumnBridge.column(SortedFirstCommon(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def positionalMatchCount(a: Column, b: Column): Column =
    ColumnBridge.column(PositionalMatchCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedJaccard(a: Column, b: Column, threshold: Double): Column =
    ColumnBridge.column(SortedJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b), threshold))
}
