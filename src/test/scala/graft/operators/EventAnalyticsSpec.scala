package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent in-memory references for the funnel / retention /
  * transitions triad: each test recomputes the expected answer from the
  * collected sf0.001 events with plain Scala collections and compares the
  * operator's full output. */
class EventAnalyticsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // (user_id, event_id, event_type, epoch µs), the operators' own base.
  private lazy val evs: Seq[(Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  private val steps = Seq("signup", "view", "click", "purchase")

  test("funnel: greedy earliest-chain counts match an independent fold") {
    val expected = Array.fill(steps.length)(0L)
    evs.groupBy(_._1).foreach { case (_, rows) =>
      // greedy chain: earliest step-0 time, then earliest strictly-later
      // occurrence of each next step
      var prev = Option.empty[Long]
      var alive = true
      steps.zipWithIndex.foreach { case (st, i) =>
        if (alive) {
          val t = rows.iterator
            .filter(e => e._3 == st && prev.forall(p => e._4 > p))
            .map(_._4).minOption
          t match {
            case Some(m) => expected(i) += 1; prev = Some(m)
            case None    => alive = false
          }
        }
      }
    }
    val got = EventAnalytics.funnel(spark, sf, steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == steps.zipWithIndex.map { case (st, i) =>
      ((i + 1).toLong, st, expected(i))
    })
    // funnel counts are monotone non-increasing by construction
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
    assert(got.head._3 > 0)
  }

  test("retention: cohort-week × offset distinct-user counts match") {
    val day = evs.map(e => (e._1, e._4 / 86400000000L))
    val d0 = day.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val expected = day.map { case (u, d) =>
      (d0(u) / 7, (d - d0(u)) / 7, u)
    }.distinct.groupBy(t => (t._1, t._2)).map { case (k, us) => k -> us.size.toLong }
    val got = EventAnalytics.retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // every user's cohort row exists at offset 0
    assert(expected.keys.exists(_._2 == 0L))
  }

  test("sessions: batch gaps-and-islands equals an independent fold") {
    val gapMs = 30 * 60 * 1000L
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val tms = rows.map(_._4 / 1000L).sorted
      val sess = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var start = tms.head; var last = tms.head; var cnt = 1L
      tms.tail.foreach { t =>
        if (t - last > gapMs) { sess += ((u, start, last, cnt)); start = t; cnt = 0L }
        last = t; cnt += 1
      }
      sess += ((u, start, last, cnt))
      sess
    }.sortBy(t => (t._1, t._2))
    val got = EventAnalytics.sessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.size > evs.map(_._1).distinct.size) // gaps actually split
  }

  test("native session_window twin is bit-identical to the gaps-and-islands path") {
    val custom = EventAnalytics.sessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val native = EventAnalytics.sessionsNative(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(native == custom)
    // Boundary semantics: Spark merges TOUCHING session windows, so two
    // events exactly gapMs apart merge (same as the custom > gap rule)
    // and gapMs+1 splits.
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Seq((1L, 1L, "a", 0L), (2L, 1L, "a", gapMs * 1000L),
        (3L, 2L, "a", 0L), (4L, 2L, "a", (gapMs + 1L) * 1000L))
      .toDF("event_id", "user_id", "event_type", "tus")
      .withColumn("ts", timestamp_micros(col("tus")))
      .drop("tus")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val edge = EventAnalytics.sessionsNative(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq.sorted
    assert(edge == Seq((1L, 2L), (2L, 1L), (2L, 1L))) // u1 merges, u2 splits
    val edgeCustom = EventAnalytics.sessions(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq.sorted
    assert(edgeCustom == edge)
  }

  test("abtest z twin: z² agrees with the exact decimal χ²; degenerate corpus yields NULL") {
    val r = EventAnalytics.abTestZ(spark, sf).head()
    // the in-row tolerance gate holds on the real corpus
    assert(!r.isNullAt(4) && !r.isNullAt(5) && r.getBoolean(6))
    assert(math.abs(r.getDouble(4) * r.getDouble(4) * 1e6 -
      r.getLong(5).toDouble) <= 1000.0)
    // degenerate corpus (EVERY user converts): a zero χ² marginal —
    // both legs must return the agreed NULL sentinel, never a crash or
    // an engine-specific divide-by-zero (ADVICE r12: Spark's non-ANSI
    // decimal div nulls where DuckDB's // raises; the guard is now
    // spelled identically on both sides)
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ab").toString
    Seq((1L, 1L, "purchase", 1.0, 0L), (2L, 2L, "purchase", 2.0, 1000000L))
      .toDF("event_id", "user_id", "event_type", "value", "tus")
      .withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val dr = EventAnalytics.abTest(spark, d).head()
    assert(dr.isNullAt(6), "chi2_micro must be the NULL sentinel")
    val dz = EventAnalytics.abTestZ(spark, d).head()
    assert(dz.isNullAt(4) && dz.isNullAt(5) && dz.isNullAt(6))
  }

  test("transitions: per-user consecutive-pair counts match") {
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._4, e._2)).map(_._3)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = EventAnalytics.transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    assert(got.toMap == expected)
    // output is sorted by (from, to)
    val keys = got.map(_._1).toSeq
    assert(keys == keys.sorted)
    // conservation: transitions per user = events per user - 1 (when >=1)
    val totalExpected = evs.groupBy(_._1).map { case (_, r) => r.size - 1 }.sum
    assert(got.map(_._2).sum == totalExpected)
  }

  test("paths: top-k trigram counts and ranks match an independent fold") {
    val trigrams = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._4, e._2)).map(_._3)
      ordered.sliding(3).filter(_.size == 3).map(w => (w(0), w(1), w(2))).toSeq
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val expected = trigrams.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(25)
      .zipWithIndex.map { case ((p, n), i) => (i + 1L, p._1, p._2, p._3, n) }
    val got = EventAnalytics.topPaths(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(got.toSeq == expected, s"got ${got.take(3).toSeq}")
    // conservation: trigrams per user = events per user - 2 (when >= 2)
    assert(trigrams.values.sum ==
      evs.groupBy(_._1).map { case (_, r) => math.max(0, r.size - 2) }.sum)
  }
}
