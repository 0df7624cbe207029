package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** Pins the bench self-adjudication comparator against REAL driver
  * artifacts — the round-11 version was verified only against a
  * fabricated BENCH file that had a `queries` field the driver's real
  * artifacts lack, which is exactly how it shipped vacuous (judge r11
  * What's-wrong #1). Every fixture here is either a verbatim copy of
  * the committed BENCH_r10.json / bench_result.json or a synthetic file
  * exercising one specific fallback path.
  */
class BenchAdjSpec extends AnyFunSuite {

  private def tmp(): Path = Files.createTempDirectory("bench-adj")
  private def write(dir: Path, name: String, body: String): Unit =
    Files.write(dir.resolve(name), body.getBytes(UTF_8))

  test("real driver BENCH_r10.json alone yields no medians (no queries anywhere)") {
    // The honest negative: the r10 artifact's tail holds only memory
    // triples — the comparator must NOT invent data from it.
    val d = tmp()
    Files.copy(Paths.get("BENCH_r10.json"), d.resolve("BENCH_r10.json"))
    assert(Bench.latestPrevRound(d) === Map.empty)
  }

  test("real BENCH_r10.json + real bench_result.json falls back to bench_result") {
    // The live-driver scenario: BENCH artifact unusable, previous
    // round's committed bench_result.json is the effective source.
    // (bench_result.json is overwritten every round, so assert shape,
    // not specific values — exact-value parsing is pinned below on a
    // frozen fixture.)
    val d = tmp()
    Files.copy(Paths.get("BENCH_r10.json"), d.resolve("BENCH_r10.json"))
    Files.copy(Paths.get("bench_result.json"), d.resolve("bench_result.json"))
    val prev = Bench.latestPrevRound(d)
    assert(prev.size > 100, s"expected the full suite, got ${prev.size}")
    assert(prev.contains("profile_qsketch") && prev("profile_qsketch") > 0.0)
    assert(prev.values.forall(_ >= 0.0))
  }

  test("bench_result fallback parses exact values (frozen r11 fixture)") {
    // Verbatim prefix of the committed r11 driver artifact, frozen here
    // so the exact-value path stays pinned as the live file churns.
    val d = tmp()
    Files.copy(Paths.get("BENCH_r10.json"), d.resolve("BENCH_r10.json"))
    write(d, "bench_result.json",
      """{"metric":"total","value":249.889,"unit":"sec","queries":{"profile_qsketch":4.215,"q29_topk_per_key":0.565,"graph_triangles":0.355,"stream_recovery":6.019}}""")
    val prev = Bench.latestPrevRound(d)
    assert(math.abs(prev("profile_qsketch") - 4.215) < 1e-9)
    assert(math.abs(prev("stream_recovery") - 6.019) < 1e-9)
  }

  test("round ordering is numeric, not lexicographic") {
    // Lexicographic put BENCH_r9 above BENCH_r10..r99 (ADVICE r11).
    val d = tmp()
    write(d, "BENCH_r9.json", """{"queries":{"x":9.0}}""")
    write(d, "BENCH_r10.json", """{"queries":{"x":10.0}}""")
    assert(Bench.latestPrevRound(d) === Map("x" -> 10.0))
  }

  test("parsed.queries and complete tail-embedded queries both parse") {
    val d1 = tmp()
    write(d1, "BENCH_r3.json", """{"parsed":{"queries":{"a":1.5}}}""")
    assert(Bench.latestPrevRound(d1) === Map("a" -> 1.5))
    val d2 = tmp()
    write(d2, "BENCH_r3.json",
      """{"parsed":null,"tail":"l\",\"queries\":{\"a\":2.5,\"b\":0.25},\"raw_operators\":{}"}""")
    assert(Bench.latestPrevRound(d2) === Map("a" -> 2.5, "b" -> 0.25))
  }

  test("a tail truncated MID-queries falls through to bench_result.json") {
    val d = tmp()
    write(d, "BENCH_r3.json",
      """{"parsed":null,"tail":"\"queries\":{\"a\":2.5,\"b\":0."}""")
    write(d, "bench_result.json", """{"queries":{"c":3.0}}""")
    assert(Bench.latestPrevRound(d) === Map("c" -> 3.0))
  }

  test("targeted runs cannot clobber the committed full-suite comparator") {
    // Regression for commit a26abb8 (judge r12 What's-wrong #2): a
    // targeted adjudicator test run from the repo root AFTER the 203-row
    // close overwrote bench_result.json with a 2-query file, and the
    // clobber was committed — silently disarming the next round's
    // self-adjudication. Targeted (SPARK_GRAFT_ONLY) runs now write
    // bench_result.partial.json; reproduce the exact scenario and prove
    // the full close file survives.
    val d = tmp()
    val full = """{"metric":"total","value":271.86,"unit":"sec",""" +
      """"queries":{"q1_agg":0.5,"dedup_exact":0.7,"profile_sketch":1.9}}"""
    write(d, "bench_result.json", full) // the committed close artifact
    // ... then a targeted 2-query run writes its result:
    val targeted = """{"metric":"total","value":3.9,"unit":"sec",""" +
      """"queries":{"events_rfm":2.1,"events_abtest":1.8}}"""
    write(d, Bench.resultFileName(targeted = true), targeted)
    // the close file is byte-identical, the partial landed alongside
    assert(new String(Files.readAllBytes(d.resolve("bench_result.json")),
      UTF_8) === full)
    assert(Files.exists(d.resolve("bench_result.partial.json")))
    // and the adjudication comparator still reads the FULL suite (the
    // partial name is invisible to latestPrevRound's fallback)
    assert(Bench.latestPrevRound(d).keySet ===
      Set("q1_agg", "dedup_exact", "profile_sketch"))
    // name routing itself: full-suite runs own the canonical name
    assert(Bench.resultFileName(targeted = false) === "bench_result.json")
    assert(Bench.resultFileName(targeted = true) === "bench_result.partial.json")
  }

  test("drift thresholds flag the real r10->r11 profile_qsketch regression") {
    val prev = Map("profile_qsketch" -> 2.191, "dedup_jaccard" -> 5.588,
      "stream_recovery" -> 5.213)
    val results = Seq(
      "profile_qsketch" -> 4.215,  // +2.02 s AND 1.92x -> must flag
      "dedup_jaccard" -> 5.770,    // +0.18 s -> noise
      "stream_recovery" -> 6.019,  // +0.8 s, 1.15x -> below both bars
      "unseen_row" -> 9.0)         // no previous median -> skip
    val flagged = Bench.driftedRows(results, prev, 4)
    assert(flagged.map(_._1) === Seq("profile_qsketch"))
    // and the absolute-drift ranking takes the worst n
    val many = Seq("a" -> 10.0, "b" -> 20.0, "c" -> 15.0)
    val prev2 = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    assert(Bench.driftedRows(many, prev2, 2).map(_._1) === Seq("b", "c"))
  }

  test("box ratio normalizes drift thresholds (judge r15 Next #6)") {
    // A uniformly 1.10x-slower box must NOT adjudicate uniformly
    // 1.10x-slower rows: at boxRatio 1.10 the comparator scales with
    // the box and nothing clears the 1.5x bar...
    val prev = Map("a" -> 4.0, "b" -> 6.0, "c" -> 8.0)
    val slowBox = Seq("a" -> 4.4, "b" -> 6.6, "c" -> 8.8)
    assert(Bench.driftedRows(slowBox, prev, 4).isEmpty) // below 1.5x anyway
    val slower = Seq("a" -> 6.4, "b" -> 9.6, "c" -> 12.8) // 1.6x everywhere
    assert(Bench.driftedRows(slower, prev, 4).nonEmpty)
    // ...the SAME rows under a 1.45x box ratio are within the scaled bar
    assert(Bench.driftedRows(slower, prev, 4, boxRatio = 1.45).isEmpty)
    // a true regression still clears the box-scaled thresholds
    val real = Seq("a" -> 6.4, "b" -> 19.6, "c" -> 12.8)
    assert(Bench.driftedRows(real, prev, 4, boxRatio = 1.45)
      .map(_._1) === Seq("b"))
    // and a FASTER box tightens the bar: a row flat vs the comparator
    // while everything else sped up 2x is a relative regression
    assert(Bench.driftedRows(Seq("a" -> 4.0), Map("a" -> 4.0), 4,
      boxRatio = 0.5).map(_._1) === Seq("a"))
  }

  test("comparator box_score comes from the SAME source as the medians") {
    // BENCH artifact carries queries AND box -> both from it
    val d1 = tmp()
    write(d1, "BENCH_r3.json",
      """{"queries":{"a":1.5},"box_score":0.420}""")
    write(d1, "bench_result.json",
      """{"queries":{"z":9.9},"box_score":0.900}""")
    val (q1, b1) = Bench.latestPrevComparator(d1)
    assert(q1 === Map("a" -> 1.5) && b1.contains(0.420))
    // BENCH artifact unusable (no queries) -> bench_result supplies
    // BOTH, even though the BENCH tail carries a box_score literal
    val d2 = tmp()
    write(d2, "BENCH_r3.json",
      """{"parsed":null,"tail":"\"box_score\":0.111,\"queries\":{\"a\":2."}""")
    write(d2, "bench_result.json",
      """{"queries":{"z":9.9},"box_score":0.900}""")
    val (q2, b2) = Bench.latestPrevComparator(d2)
    assert(q2 === Map("z" -> 9.9) && b2.contains(0.900))
    // tail-embedded box parses when the tail also yields the queries
    val d3 = tmp()
    write(d3, "BENCH_r3.json",
      """{"parsed":null,"tail":"\"queries\":{\"a\":2.5},\"box_score\":0.433,\"x\":1"}""")
    val (q3, b3) = Bench.latestPrevComparator(d3)
    assert(q3 === Map("a" -> 2.5) && b3.contains(0.433))
    // pre-r15 comparator (no box anywhere): medians yes, box None
    val d4 = tmp()
    write(d4, "bench_result.json", """{"queries":{"a":1.0}}""")
    val (q4, b4) = Bench.latestPrevComparator(d4)
    assert(q4 === Map("a" -> 1.0) && b4.isEmpty)
  }

  test("drift factor is the median common-row ratio, tail-insensitive") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "d" -> 1.0)
    // ratios: a 1.1, b 1.1, c 1.1 — and one 10x tail that must NOT move
    // the median (a mean would read 3.3)
    val results = Seq("a" -> 1.1, "b" -> 2.2, "c" -> 4.4, "d" -> 10.0,
      "unseen" -> 9.9) // no previous median -> excluded
    val f = Bench.driftFactor(results, prev)
    assert(f.exists(v => math.abs(v - 1.1) < 1e-9), f.toString)
    // no common rows (targeted run / first round) -> None, not a crash
    assert(Bench.driftFactor(Seq("x" -> 1.0), Map.empty).isEmpty)
    // zero previous median never divides: the row is excluded
    assert(Bench.driftFactor(Seq("z" -> 1.0), Map("z" -> 0.0)).isEmpty)
    // ERRORED rows are excluded (ADVICE r14): a thrown query's ~0 s
    // timing would otherwise drag a ~0 ratio into the pool
    val withErr = results :+ ("boom" -> 0.001)
    val prevErr = prev + ("boom" -> 5.0)
    val fe = Bench.driftFactor(withErr, prevErr, errored = Set("boom"))
    assert(fe.exists(v => math.abs(v - 1.1) < 1e-9), fe.toString)
    // even-count median is the midpoint of the two middle elements,
    // not the upper-middle one
    val even = Bench.driftFactor(
      Seq("a" -> 1.0, "b" -> 2.0), Map("a" -> 1.0, "b" -> 1.0))
    assert(even.exists(v => math.abs(v - 1.5) < 1e-9), even.toString)
  }

  test("box-score kernel: fixed work, pinned checksum, positive time") {
    // The checksum literal pins the WORKLOAD: an edit to the mixing
    // loop (iteration count, constants, operation order) lands here
    // before it silently changes what box_score measures across rounds.
    val (secs, sum) = Bench.boxScoreKernel()
    assert(sum === 6688301274791546823L, f"checksum drift: $sum%d")
    assert(secs > 0.0)
    // work actually scales with the iteration budget (the loop is not
    // constant-folded or dead-code-eliminated)
    assert(Bench.boxScoreKernel(1000L)._2 !== sum)
  }
}
