package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent in-memory references for the record-linkage family and
  * the SCD2 history build. */
class LinkageSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val custs: Seq[(Long, String, Int, String)] =
    Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private lazy val expectedPairs: Seq[(Long, Long, Long)] = (for {
    a <- custs; b <- custs
    if a._1 < b._1 && a._3 == b._3 && a._4 == b._4
    d = lev(a._2, b._2)
    if d <= 1
  } yield (a._1, b._1, d.toLong)).sortBy(p => (p._1, p._2))

  test("link_pairs: blocked thresholded-Levenshtein pairs match a full DP") {
    val got = Linkage.blockedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectedPairs)
    assert(got.nonEmpty) // the corpus must actually exercise the matcher
  }

  test("deletion-variant linkage equals the blocked pair relation (sf0.001 + sf0.01)") {
    // The scale spelling must be EXACTLY the blocked relation — pair set
    // and distances — on the full-DP reference and on a bigger corpus.
    val got = Linkage.blockedPairsDeletion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectedPairs)
    val sf1 = "/root/testdata/sf0.01"
    val a = Linkage.blockedPairs(spark, sf1).collect().map(_.toSeq).toSeq
    val b = Linkage.blockedPairsDeletion(spark, sf1).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("link_clusters: assignment is the transitive closure of the pairs") {
    // union-find over the expected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expectedPairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val keys = custs.map(_._1)
    val label = keys.map(k => k -> find(k)).toMap
    val sizes = label.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val expected = keys.sorted.map(k => (k, label(k), sizes(label(k))))

    val got = Linkage.entityClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // non-degenerate: some real merging happened but not a giant blob
    val nEntities = got.map(_._2).distinct.size
    assert(nEntities < keys.size && nEntities > keys.size / 2)
  }

  test("link_golden: survivorship rules equal a union-find rollup") {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expectedPairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val bal = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val expected = custs.map(_._1).groupBy(find).toSeq.map { case (e, ks) =>
      (e, ks.size.toLong, bal(ks.min)._1, ks.map(k => bal(k)._2).max, ks.sum)
    }.sortBy(_._1)
    val got = Linkage.goldenRecords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.exists(_._2 > 1)) // at least one genuinely merged entity
  }

  test("ts_downsample: OHLC per (type, hour) equals a collected replay") {
    val got = EventAnalytics.downsampleOhlc(spark, sf).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7)))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val hourMs = 3600L * 1000
    val expect = evs.groupBy(e =>
        (e._1, new java.sql.Timestamp(e._2.getTime / hourMs * hourMs)))
      .map { case (k, xs) =>
        val inOrder = xs.sortBy(e => (e._2.getTime, e._3))
        k -> ((xs.length.toLong, inOrder.head._4, xs.map(_._4).max,
          xs.map(_._4).min, inOrder.last._4,
          xs.map(e => math.round(e._4 * 100)).sum))
      }
    assert(got == expect)
    assert(got.nonEmpty && got.values.exists(v => v._2 != v._5)) // open != close somewhere
  }

  test("scd2: consecutive equal values collapse; intervals chain half-open") {
    import spark.implicits._
    // user 1: 3.0, 3.0 (collapse), 4.0, 4.0 (collapse), 3.0 (reopens);
    // user 2: single event -> one open version.
    val log = Seq(
      (1L, 10L, 3.0, 100L), (1L, 11L, 3.0, 200L), (1L, 12L, 4.0, 300L),
      (1L, 13L, 4.0, 400L), (1L, 14L, 3.0, 500L),
      (2L, 20L, 7.0, 50L)
    ).toDF("user_id", "event_id", "value", "tus")
    val got = EventAnalytics.scd2From(log).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 100L, Some(300L), 3.0),
      (1L, 2L, 300L, Some(500L), 4.0),
      (1L, 3L, 500L, None, 3.0),
      (2L, 1L, 50L, None, 7.0)))
  }

  test("q31 higher-order lambdas match an independent fold (sf0.001)") {
    val sf0 = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, sf0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (ok, ls) =>
      // the operator's total order: (linenumber, qty, price)
      val sorted = ls.map(t => (t._2, t._3, t._4)).sorted
      val qty = sorted.map(_._2); val price = sorted.map(_._3)
      (ok, qty.count(_ > 25).toLong, qty.sum,
        qty.zip(price).map { case (q, p) => q * p }.sum, price.map(_ * 2).max)
    }
    val got = Analytics.q31HigherOrder(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("cdc merge: update, delete, insert, keep, and delete-nonexistent no-op") {
    import spark.implicits._
    // settled events: event_id % 10 != 0; changes: % 10 == 0.
    // u1: settled 1.0, change 2.0         -> updated
    // u2: settled 1.0, change error       -> deleted (absent)
    // u3: change-only 7.0                 -> inserted
    // u4: settled-only 4.0                -> kept
    // u5: change-only error               -> no-op (absent, never existed)
    // u6: settled 1.0; changes 9.0 then error LAST -> deleted
    val log = Seq(
      (1L, 11L, "view", 1.0, 100L), (1L, 20L, "click", 2.0, 200L),
      (2L, 21L, "view", 1.0, 100L), (2L, 30L, "error", 0.0, 200L),
      (3L, 40L, "view", 7.0, 100L),
      (4L, 41L, "view", 4.0, 100L),
      (5L, 50L, "error", 0.0, 100L),
      (6L, 61L, "view", 1.0, 100L), (6L, 60L, "click", 9.0, 200L),
      (6L, 70L, "error", 0.0, 300L)
    ).toDF("user_id", "event_id", "event_type", "value", "tus")
    val got = EventAnalytics.cdcMergeFrom(log).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 2.0, "updated"), (3L, 7.0, "inserted"),
      (4L, 4.0, "kept")))
  }

  test("ts_densify: gap months appear as explicit zeros, span is continuous") {
    val got = Analytics.densifyMonthly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val months = got.map(_._1).distinct.sorted
    // continuous monthly spine: every consecutive pair is 1 calendar month
    months.sliding(2).foreach { case Seq(a, b) =>
      val d = java.time.Instant.ofEpochMilli(a).atZone(java.time.ZoneOffset.UTC)
      assert(d.plusMonths(1).toInstant.toEpochMilli == b, s"$a -> $b")
    case _ => ()
    }
    // every (month, priority) combination present exactly once
    val prios = got.map(_._2).distinct
    assert(got.size == months.size * prios.size)
    assert(got.map(t => (t._1, t._2)).distinct.size == got.size)
    // totals must reconcile with the raw table (zero-fill adds nothing)
    val totalOrders = Tables.orders(spark, sf).count()
    assert(got.map(_._3).sum == totalOrders)
  }

  test("scd2 on the corpus: versions partition each user's event set") {
    val hist = EventAnalytics.scd2History(spark, sf)
    val n = Tables.events(spark, sf).count()
    // no consecutive repeats in the synthetic corpus -> every event is a
    // version; each user's last version (and only it) must be open
    assert(hist.count() == n)
    val opens = hist.filter(col("valid_to_us").isNull)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(opens == 0)
  }
}
