package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels. The codebook (m subspaces × ksub
  * centroids × dsub dims) rides along as a REFERENCE OBJECT, not as
  * literal expression trees: the spelled-out formulation — m×ksub
  * `array(...)`/`array_position` branches of [[DotProduct]]s against
  * literal arrays — was correct but its 512-node tree cost ~3 s of
  * planning + codegen per run at ANY data size (the tree is the plan,
  * regardless of rows). One expression node with an embedded double[]
  * keeps the plan tiny and the inner loop primitive.
  */
private[graft] object PqOps {
  /** Flatten codebooks to (m, ksub, dsub, books-flat, ||c||²-flat). */
  private[functions] def flatten(books: Seq[Seq[Seq[Double]]])
      : (Int, Int, Int, Array[Double], Array[Double]) = {
    val m = books.length
    val ksub = books.head.length
    val dsub = books.head.head.length
    require(books.forall(b => b.length == ksub && b.forall(_.length == dsub)),
      "ragged PQ codebook")
    val flat = new Array[Double](m * ksub * dsub)
    val cn2 = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val cent = books(j)(c)
        var s = 0.0; var i = 0
        while (i < dsub) {
          flat((j * ksub + c) * dsub + i) = cent(i); s += cent(i) * cent(i); i += 1
        }
        cn2(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    (m, ksub, dsub, flat, cn2)
  }

  def encode(v: Column, nrm: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(v), ColumnBridge.expression(nrm), books))

  def encodeResidual(v: Column, nrm: Column, listId: Column,
                     cents: Seq[Seq[Double]],
                     books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncodeResidual(ColumnBridge.expression(v),
      ColumnBridge.expression(nrm), ColumnBridge.expression(listId),
      cents, books))

  def ipTables(qv: Column, qnrm: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(
      PqIpTables(ColumnBridge.expression(qv), ColumnBridge.expression(qnrm), books))
}

private[graft] trait PqExpression extends BinaryExpression {
  def books: Seq[Seq[Seq[Double]]]
  @transient protected lazy val (m, ksub, dsub, flatBooks, cn2) = PqOps.flatten(books)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"expected (array<float|double>, double), got $l / $r")
  }
  protected def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def elem(a: ArrayData, i: Int): Double =
    if (vecIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** PQ encoding: vector → m codes, code j = argmin over the subspace-j
  * codebook of ‖v/nrm − c‖². The per-(vector, subspace) constant
  * ‖v_sub/nrm‖² is dropped, leaving ‖c‖² − 2·(v_sub·c)/nrm — one dot per
  * centroid. First-min tie-break (strict <) keeps codes deterministic.
  * Fully codegen'd: this runs once per CORPUS row, the 100-TB side. */
case class PqEncode(left: Expression, right: Expression,
                    books: Seq[Seq[Seq[Double]]]) extends PqExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val nrm = r.asInstanceOf[Double]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        val base = (j * ksub + c) * dsub
        while (i < dsub) { d += elem(v, j * dsub + i) * flatBooks(base + i); i += 1 }
        val dist = cn2(j * ksub + c) - 2.0 * d / nrm
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "double[]")
    val get = if (vecIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d"); val dist = ctx.freshName("dist")
      val base = ctx.freshName("base")
      s"""
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $d = 0.0;
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      $d += ((double) $v.$get($j * $dsub + $i)) * $booksRef[$base + $i];
         |    }
         |    double $dist = $cn2Ref[$j * $ksub + $c] - 2.0 * $d / $nrm;
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** RESIDUAL PQ encoding (Jégou et al. 2011 §IV.A — the IVFADC refinement
  * FAISS ships as default): codes quantize v/nrm − c_list, the vector's
  * offset from its coarse centroid, not the raw vector. When `nlist` is
  * large enough that cells are tight, residual spread ≪ vector spread and
  * the same ksub centroids model it far more finely. The coarse codebook
  * AND the residual codebooks ride as reference objects; the inner loop
  * is the direct ‖r_sub − c‖² scan (dsub·ksub mul-adds per subspace),
  * fully codegen'd — still one corpus-wide projection.
  *
  * children: (v, nrm, list_id). ADC consumers score
  * q̂·c_list + Σ_j tables[j][code_j] with tables built by [[PqIpTables]]
  * over the RESIDUAL books ([[graft.operators.Similarity.ivfPqTopK]]). */
case class PqEncodeResidual(first: Expression, second: Expression,
                            third: Expression,
                            cents: Seq[Seq[Double]],
                            books: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  @transient private lazy val (m, ksub, dsub, flatBooks, _) = PqOps.flatten(books)
  @transient private lazy val dim = cents.head.length
  @transient private lazy val flatCents: Array[Double] = {
    require(cents.forall(_.length == dim), "ragged coarse codebook")
    cents.flatten.toArray
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"expected (array<float|double>, double, bigint), got $a / $b / $c")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def vecIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v0: Any, n0: Any, l0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val nrm = n0.asInstanceOf[Double]
    val cbase = l0.asInstanceOf[Long].toInt * dim
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        val base = (j * ksub + c) * dsub
        while (i < dsub) {
          val vi = if (vecIsFloat) v.getFloat(j * dsub + i).toDouble
                   else v.getDouble(j * dsub + i)
          val t = vi / nrm - flatCents(cbase + j * dsub + i) - flatBooks(base + i)
          d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqResBooks", flatBooks, "double[]")
    val centsRef = ctx.addReferenceObj("pqCoarse", flatCents, "double[]")
    val get = if (vecIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, nrm, lid) => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val base = ctx.freshName("base"); val cbase = ctx.freshName("cbase")
      s"""
         |int[] $codes = new int[$m];
         |int $cbase = ((int) $lid) * $dim;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $d = 0.0;
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $t = ((double) $v.$get($j * $dsub + $i)) / $nrm
         |        - $centsRef[$cbase + $j * $dsub + $i] - $booksRef[$base + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression) =
    copy(first = a, second = b, third = c)
}

/** Per-query ADC inner-product tables: tables[j][c] = (q_sub·c)/qnrm.
  * Runs only on the broadcast QUERY rows (control-plane sized), so
  * interpreted eval is fine — what matters is that the plan carries one
  * node, not m×ksub dot trees. */
case class PqIpTables(left: Expression, right: Expression,
                      books: Seq[Seq[Seq[Double]]])
    extends PqExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val nrm = r.asInstanceOf[Double]
    val tables = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val t = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        val base = (j * ksub + c) * dsub
        while (i < dsub) { d += elem(v, j * dsub + i) * flatBooks(base + i); i += 1 }
        t(c) = d / nrm
        c += 1
      }
      tables(j) = UnsafeArrayData.fromPrimitiveArray(t)
      j += 1
    }
    new GenericArrayData(tables.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
