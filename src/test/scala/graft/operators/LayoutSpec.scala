package graft.operators

import graft.SparkSpec
import graft.functions.ZOrderOps
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("z-value interleaves bits: known values, codegen = eval") {
    // 0b11 and 0b01 → odd bits 1,1 / even bits 0,1 → 0b1011 = 11
    assert(ZOrderOps.interleave(3L, 1L) == 11L)
    assert(ZOrderOps.interleave(0L, 0L) == 0L)
    assert(ZOrderOps.interleave(1L, 0L) == 2L)
    assert(ZOrderOps.interleave(0L, 1L) == 1L)
    // full 32-bit keys survive the cascade
    assert(ZOrderOps.interleave(0xffffffffL, 0L) == 0xaaaaaaaaaaaaaaaaL)
    assert(ZOrderOps.interleave(0L, 0xffffffffL) == 0x5555555555555555L)
    // the codegen'd expression matches the Scala kernel on a grid
    import spark.implicits._
    val rows = (0L until 16L).flatMap(a => (0L until 16L).map(b => (a, b)))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrderOps.zvalue(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrderOps.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-order locality: square blocks of the key plane are contiguous on the curve") {
    // every 2x2-aligned square occupies exactly 4 consecutive curve values
    for (ax <- 0 until 8; by <- 0 until 8) {
      val zs = for (dx <- 0 to 1; dy <- 0 to 1)
        yield ZOrderOps.interleave(ax * 2L + dx, by * 2L + dy)
      assert(zs.max - zs.min == 3, s"square ($ax,$by) not contiguous: $zs")
    }
  }

  test("z-ordered copy answers the band aggregate identically to the raw table") {
    val dir = "/root/testdata/sf0.001"
    val got = Layout.zorderQuery(spark, dir).collect()(0)
    val (pLo, pHi, sLo, sHi) = Layout.bandBounds(spark, dir)
    val want = Tables.lineitem(spark, dir)
      .filter(col("l_partkey").between(pLo, pHi) &&
              col("l_suppkey").between(sLo, sHi))
      .agg(count(lit(1)),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double"))
      .collect()(0)
    assert(got.getLong(0) == want.getLong(0) && got.getLong(0) > 0)
    assert(got.getDouble(1) == want.getDouble(1))
    assert(got.getDouble(2) == want.getDouble(2))
  }

  test("hilbert: bijective on the grid, unit-step adjacency, codegen = eval") {
    import graft.functions.{HilbertOps, ZOrderOps => Z}
    val order = 3
    val n = 1 << order
    val cells = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val ds = cells.map { case (x, y) => (x, y) -> Z.hilbertD(order, x, y) }
    // bijection onto [0, n^2)
    assert(ds.map(_._2).sorted.toSeq == (0L until n.toLong * n).toSeq)
    // THE Hilbert property Morton lacks: consecutive d are grid
    // neighbors (|dx| + |dy| = 1) — no diagonal jumps, ever
    val byD = ds.map { case ((x, y), d) => d -> (x, y) }.toMap
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // Morton, for contrast, does jump (the documented difference)
    val mByD = cells.map(c => Z.interleave(c._1, c._2) -> c).toMap
    assert((0L until n.toLong * n - 1).exists { d =>
      val (x1, y1) = mByD(d); val (x2, y2) = mByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    })
    // codegen'd expression equals the Scala kernel (16-bit order too)
    import spark.implicits._
    val rows = (0L until 16L).flatMap(a => (0L until 16L).map(b => (a, b)))
      .toDF("a", "b")
      .select(col("a"), col("b"), HilbertOps.hvalue(col("a"), col("b"), 4).as("h"))
      .collect()
    rows.foreach(r => assert(r.getLong(2) == Z.hilbertD(4, r.getLong(0), r.getLong(1))))
  }

  test("hilbert copy answers the band aggregate identically to the raw table") {
    val dir = "/root/testdata/sf0.001"
    val got = Layout.hilbertQuery(spark, dir).collect()(0)
    val want = Layout.zorderQuery(spark, dir).collect()(0)
    assert(got.getLong(0) == want.getLong(0) && got.getLong(0) > 0)
    assert(got.getDouble(1) == want.getDouble(1))
    assert(got.getDouble(2) == want.getDouble(2))
  }

  test("band predicate reaches the parquet scan as pushed filters") {
    val dir = "/root/testdata/sf0.001"
    val q = Layout.zorderQuery(spark, dir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(l_partkey"),
      s"expected pushed band filters, got:\n$plan")
  }
}
