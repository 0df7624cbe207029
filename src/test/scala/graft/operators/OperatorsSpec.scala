package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operator semantics on tiny planted fixtures (written as parquet into a
  * temp dir with the standard table names, so the operators run unchanged). */
class OperatorsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-fixture").toString
    import spark.implicits._
    Seq(
      (0L, "the cat sat on the mat", "en", "s", 22L),
      (1L, "the cat sat on the mat", "en", "s", 22L),       // exact dup of 0
      (2L, "the cat sat on the red mat", "en", "s", 26L),   // near dup of 0
      (3L, "der hund ist nicht auf der matte und das ist gut", "de", "s", 48L),
      (4L, "completely different words entirely unrelated content here", "en", "s", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val base = Array.fill(64)(0.1f)
    val near = base.clone(); near(0) = 0.11f                 // ~same direction as base
    val anti = base.map(-_)                                  // opposite
    val ortho = Array.tabulate(64)(i => if (i % 2 == 0) 0.1f else -0.1f)
    Seq((0L, base.toSeq, 0), (1L, near.toSeq, 0), (2L, anti.toSeq, 1), (3L, ortho.toSeq, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val rows = Dedup.exact(spark, dir).collect()
    assert(rows.length == 4) // 5 docs, one exact-dup pair
    val dup = rows.find(_.getLong(0) == 0L).get
    assert(dup.getLong(1) == 2L)
  }

  test("token-set jaccard: dup pair at 1.0, near pair high, unrelated absent") {
    val pairs = Dedup.jaccardPairs(spark, dir, threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.8 && pairs((0L, 2L)) < 1.0) // {the,cat,sat,on,mat} vs +{red}
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("containment: directed small->big pairs; sf0.001 equals the all-pairs brute") {
    // fixture: docs 0/1 identical (5 tokens), doc 2 = 0 + "red" (6):
    // 0-in-1 (tie by id), 0-in-2 and 1-in-2 all at containment 1.0
    val out = Dedup.containmentPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out == Map(
      (0L, 1L) -> ((5L, 5L, 1.0)), (0L, 2L) -> ((5L, 5L, 1.0)),
      (1L, 2L) -> ((5L, 5L, 1.0))))
    // independent all-pairs replay on real data
    val d001 = "/root/testdata/sf0.001"
    val sets = Tables.documents(spark, d001).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSet).toMap
    val brute = (for {
      (ia, ta) <- sets.toSeq; (ib, tb) <- sets.toSeq
      if ta.size < tb.size || (ta.size == tb.size && ia < ib)
      ov = (ta & tb).size
      if ov.toDouble / ta.size >= 0.95
    } yield (ia, ib) -> ((ov.toLong, ta.size.toLong, ov.toDouble / ta.size))).toMap
    val op = Dedup.containmentPairs(spark, d001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(op == brute, s"op=${op.size} brute=${brute.size}")
    assert(brute.nonEmpty) // the corpus genuinely exercises the path
  }

  test("containment rejoin twin is bit-identical to the carry spelling") {
    // the A/B twin (r13 brief #3): min_by-on-join-token retention must
    // pick the SAME row sortedFirstCommon retains, so fixture, real
    // corpus AND a shared-vocab Zipfian corpus (the regime the twin
    // exists for) all match pair-for-pair, value-for-value
    def rows(d: String, t: Double) = {
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      (canon(Dedup.containmentPairsUnsorted(spark, d, t)),
        canon(Dedup.containmentPairsRejoinUnsorted(spark, d, t)),
        canon(Dedup.containmentPairsRarestUnsorted(spark, d, t)))
    }
    val (c1, r1, f1) = rows(dir, 0.95)
    assert(c1 == r1 && c1 == f1 && c1.nonEmpty)
    val (c2, r2, f2) = rows("/root/testdata/sf0.001", 0.95)
    assert(c2 == r2 && c2 == f2 && c2.nonEmpty)
    val zdir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    graft.tools.ContainZipf.buildZipf(spark, zdir, nDocs = 300, vocab = 2000)
    val (c3, r3, f3) = rows(zdir, 0.95)
    assert(c3 == r3, s"carry=${c3.size} rejoin=${r3.size}")
    assert(c3 == f3, s"carry=${c3.size} rarest=${f3.size}")
    // the planted subset pairs guarantee the zipf path is non-trivial
    assert(c3.size >= 30, s"zipf corpus must plant pairs, got ${c3.size}")
    // the public ordering knob routes to the same relation
    val viaKnob = Dedup.containmentPairs(spark, zdir, 0.95, rarestFirst = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(viaKnob == c3)
  }

  test("auto prefix ordering picks carry on sf corpora, rarest on shared-vocab zipf") {
    // The engine decision (judge r14 brief #1). Calibration pins
    // (full-corpus replay of the same formula, BASELINE.md r14): the sf
    // corpora read candHash/candRarest ~= 1.0 at BOTH thresholds (the
    // 31-word vocabulary makes every token common, so rarest ordering
    // buys nothing and its extra shuffles are pure loss), while zipf
    // corpora read 19-393 (head words with df ~= N land in hash-order
    // prefixes). The decision threshold 8 sits between with wide margin.
    assert(!Dedup.chooseRarestPrefix(spark, "/root/testdata/sf0.001", 0.95))
    assert(!Dedup.chooseRarestPrefix(spark, "/root/testdata/sf0.01", 0.95))
    assert(!Dedup.chooseRarestPrefix(spark, "/root/testdata/sf0.001", 0.85))
    val zdir = Files.createTempDirectory("graft-zipf-auto").toString
    graft.tools.ContainZipf.buildZipf(spark, zdir, nDocs = 300, vocab = 2000)
    assert(Dedup.chooseRarestPrefix(spark, zdir, 0.95))
    assert(Dedup.chooseRarestPrefix(spark, zdir, 0.85))
    // the registered entry (now auto) serves the identical pair relation
    // on the corpus where the decision flips to rarest
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val auto = canon(Dedup.containmentPairs(spark, zdir))
    val manual = canon(Dedup.containmentPairs(spark, zdir, 0.95, rarestFirst = true))
    assert(auto == manual && auto.nonEmpty)
    // jaccard dispatch: auto output equals both manual spellings where
    // the decision picks rarest (hash-order twin pinned equal elsewhere)
    def canonJ(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ja = canonJ(Dedup.jaccardPairsAutoUnsorted(spark, zdir, 0.85))
    val jp = canonJ(Dedup.jaccardPairsUnsorted(spark, zdir, 0.85))
    assert(ja == jp)
  }

  test("df-capped prefix joins: subset, covered-pair retention, auto regime") {
    // The r15 engine decision (judge r14 Next #1): the THEOREM checks
    // run on a uniformly-saturated fixture (vocab 2000 under 2200 docs,
    // tailDf ~= 7.9, every 20th base doc boilerplate) where the fence
    // genuinely loses pairs — and on that SAME fixture the auto
    // decision must REFUSE the cap (measured coverage ~0.909 < 0.95:
    // the "outliers" are a tenth of the corpus, not a fringe, and
    // capping would cost 37% of pairs — the CapMinCoverage guard's
    // raison d'etre). The operator is exercised via cappedPlanOn (the
    // unconditional stats), the decision via choosePrefixPlanOn.
    val docs = Dedup.zipfDocs(spark, nDocs = 2000, vocab = 2000, stopEvery = 20)
    val cplan = Dedup.cappedPlanOn(docs, 0.95)
    assert(cplan.tailDf >= Dedup.SatTailDf, cplan.toString)
    assert(cplan.coverage > 0.85 && cplan.coverage < Dedup.CapMinCoverage,
      s"fixture must sit below the coverage guard, got ${cplan.coverage}")
    assert(Dedup.choosePrefixPlanOn(docs, 0.95) === Dedup.RarestPlan,
      "the guard must refuse the cap when the outlier class is not a fringe")
    val cap = cplan.maxDf
    val sets = Dedup.hashedTokenSetsOf(docs).localCheckpoint()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val truth = canon(Dedup.containmentPairsRarestFromSets(sets, 0.95))
    val capped = canon(Dedup.containmentPairsRarestFromSets(sets, 0.95, cap))
    // subset with BIT-IDENTICAL surviving rows
    assert(capped.forall { case (k, v) => truth.get(k).contains(v) })
    assert(truth.nonEmpty && capped.size < truth.size,
      s"fixture must make the cap lose SOME pairs (truth=${truth.size}, " +
        s"capped=${capped.size}) or the recall number is rigged")
    // the theorem: no pair whose small side is COVERED (>= prefLen
    // tokens of df <= cap) is ever lost
    val dfc = sets.select(explode(col("toks")).as("tok"))
      .groupBy("tok").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val covered = sets.collect().map { r =>
      val toks = r.getSeq[Long](1)
      val pl = toks.size - math.ceil(0.95 * toks.size).toInt + 1
      r.getLong(0) -> (toks.count(t => dfc(t) <= cap) >= pl)
    }.toMap
    val lost = truth.keySet -- capped.keySet
    assert(lost.nonEmpty && lost.forall { case (small, _) => !covered(small) },
      s"every lost pair's small side must be uncovered; lost=$lost")
    // maxDf = MaxValue is the exact spelling (same code path)
    val uncapped = canon(Dedup.containmentPairsRarestFromSets(sets, 0.95,
      maxDf = Long.MaxValue))
    assert(uncapped == truth)
    // jaccard capped twin: subset + no both-covered pair lost
    def canonJ(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val jplan = Dedup.cappedPlanOn(docs, 0.85)
    val jtruth = canonJ(Dedup.jaccardPairsFromSets(sets, 0.85))
    val jcapped = canonJ(Dedup.jaccardPairsFromSets(sets, 0.85,
      maxDf = jplan.maxDf))
    assert(jcapped.forall { case (k, v) => jtruth.get(k).contains(v) })
    val coveredJ = sets.collect().map { r =>
      val toks = r.getSeq[Long](1)
      val pl = toks.size - math.ceil(0.85 * toks.size).toInt + 1
      r.getLong(0) -> (toks.count(t => dfc(t) <= jplan.maxDf) >= pl)
    }.toMap
    val lostJ = jtruth.keySet -- jcapped.keySet
    assert(lostJ.forall { case (a, b) => !coveredJ(a) || !coveredJ(b) })
    // regime pins: the sf corpus stays carry; an UNSATURATED zipf stays
    // rarest (the cap only ever engages where both orderings are
    // quadratic); the gate fixture (saturated AND fringe-boilerplate)
    // is where the capped plan actually engages
    assert(Dedup.choosePrefixPlanOn(
      graft.operators.Tables.documents(spark, "/root/testdata/sf0.001"),
      0.95) === Dedup.CarryPlan)
    assert(Dedup.choosePrefixPlanOn(
      Dedup.zipfDocs(spark, nDocs = 300, vocab = 2000), 0.95) ===
      Dedup.RarestPlan)
    Dedup.choosePrefixPlanOn(
      Dedup.zipfDocs(spark, nDocs = 2000, vocab = 2500, stopEvery = 40),
      0.95) match {
      case Dedup.CappedPlan(c, t, cov) =>
        assert(c === 96L && t >= Dedup.SatTailDf &&
          cov >= Dedup.CapMinCoverage, s"cap=$c tailDf=$t cov=$cov")
      case other => fail(s"gate fixture must engage the cap, got $other")
    }
  }

  test("shingle cap derives from the shared median-multiple fence (r16)") {
    // Judge r15 Next #7: the shingle family's df cut now comes from the
    // SAME characterized fence as the word-token family — one cap rule
    // for the whole prefix-filter family. On a boilerplate-heavy zipf
    // corpus (every 10th doc drawn from the top-100 words, so whole
    // shingle runs repeat across the boilerplate class) the fence must
    // classify, and the capped shingle join must obey the same
    // subset + covered-retention theorem as the word-token twin.
    val sdir = Files.createTempDirectory("graft-zipf-shingle").toString
    graft.tools.ContainZipf.buildZipf(spark, sdir, nDocs = 600,
      vocab = 2000, stopEvery = 10)
    val plan = Dedup.shingleCapPlan(spark, sdir, 0.9)
    assert(plan.maxDf >= 1L, plan.toString)
    val sets = graft.operators.TextAnalysis.gramSets(spark, sdir)
      .localCheckpoint()
    def canonJ(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val truth = canonJ(Dedup.jaccardPairsFromSets(sets, 0.9))
    val capped = canonJ(Dedup.jaccardPairsFromSets(sets, 0.9,
      maxDf = plan.maxDf))
    assert(truth.nonEmpty, "fixture must plant shingle-level pairs")
    // subset with bit-identical surviving rows
    assert(capped.forall { case (k, v) => truth.get(k).contains(v) })
    // covered-pair retention: no pair of two covered docs is ever lost
    val dfc = sets.select(explode(col("toks")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val covered = sets.collect().map { r =>
      val toks = r.getSeq[Long](1)
      val pl = toks.size - math.ceil(0.9 * toks.size).toInt + 1
      r.getLong(0) -> (toks.count(t => dfc(t) <= plan.maxDf) >= pl)
    }.toMap
    val lost = truth.keySet -- capped.keySet
    assert(lost.forall { case (a, b) => !covered(a) || !covered(b) },
      s"a covered x covered shingle pair was lost: " +
        s"${lost.filter { case (a, b) => covered(a) && covered(b) }}")
  }

  test("jaccard auto dispatch is join-shape-aware: never caps (r16)") {
    // Judge r15 What's-wrong #2: the capped stage-3 regime only wins on
    // containment's ASYMMETRIC prefix x full-postings join — the r15
    // mixture cells measured the capped jaccard spelling SLOWER at
    // every scale (4.37 vs 2.52 s at 10x, 8.72 vs 4.23 at 20x,
    // BASELINE.md) while still recall-bounded. Pin: on the
    // dedup_contain_capped GATE fixture — the one corpus regime where
    // containment's auto decision ENGAGES the cap — jaccard's auto
    // dispatch collapses to rarest and stays bit-identical to the
    // exact hash-order spelling.
    val gdir = Files.createTempDirectory("graft-zipf-gate").toString
    graft.tools.ContainZipf.buildZipf(spark, gdir, nDocs = 2000,
      vocab = 2500, stopEvery = 40)
    val plan = Dedup.choosePrefixPlan(spark, gdir, 0.95)
    assert(plan.isInstanceOf[Dedup.CappedPlan], plan.toString)
    // containment auto DOES take the lossy branch here (the loud-log
    // recall-bounded regime): a strict value-identical subset
    def canonC(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val cAuto = canonC(Dedup.containmentPairsAutoUnsorted(spark, gdir, 0.95))
    val cTruth = canonC(Dedup.containmentPairsRarestUnsorted(spark, gdir, 0.95))
    assert(cAuto.forall { case (k, v) => cTruth.get(k).contains(v) })
    assert(cAuto.nonEmpty && cAuto.size < cTruth.size,
      s"gate fixture must make the cap drop pairs (auto=${cAuto.size}, " +
        s"truth=${cTruth.size})")
    // ...while jaccard auto REFUSES it: bit-identical to exact, on the
    // exact fixture where the pre-r16 dispatcher would silently cap
    def canonJ(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val jAuto = canonJ(Dedup.jaccardPairsAutoUnsorted(spark, gdir, 0.85))
    val jExact = canonJ(Dedup.jaccardPairsUnsorted(spark, gdir, 0.85))
    assert(jAuto == jExact && jAuto.nonEmpty)
  }

  test("auto LSH band geometry: derives the r14 constants at t=0.9, flips at t=0.7") {
    // The third engine decision (judge r14 Next #8). At the registered
    // threshold the S-curve arithmetic + sampled candidate volume must
    // re-derive the fixture constants (b=8, r=8) — so the registered
    // row's output is unchanged by construction — and at t=0.7 the
    // curve midpoint (1/b)^(1/r) moves below 0.9^8-land and the
    // decision flips to wider banding (b=16, r=4: recall 0.988 vs
    // (8,8)'s 0.378 there).
    val g9 = Dedup.chooseBandGeometry(spark, "/root/testdata/sf0.001", 64, 0.9)
    assert((g9.bands, g9.r) === ((8, 8)), g9.toString)
    assert(math.abs(g9.recallAtThreshold -
      (1.0 - math.pow(1.0 - math.pow(0.9, 8), 8))) < 1e-12)
    val g7 = Dedup.chooseBandGeometry(spark, "/root/testdata/sf0.001", 64, 0.7)
    assert((g7.bands, g7.r) === ((16, 4)), g7.toString)
    // the auto spelling serves the identical pair relation at t=0.9
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val auto = canon(Dedup.minhashPairsVerifiedAutoUnsorted(
      spark, "/root/testdata/sf0.001"))
    val manual = canon(Dedup.minhashPairsVerifiedUnsorted(
      spark, "/root/testdata/sf0.001"))
    assert(auto == manual && auto.nonEmpty)
  }

  test("auto shingle width: re-derives 3 eligible, flips on low-vocab, enumerates on saturated (r16)") {
    // The sixth engine decision. Registered corpus: the decision must
    // re-derive the pre-r16 constant width 3 in the eligible regime —
    // sampled candidate mass below all-pairs — so the registered row's
    // output is unchanged by construction.
    val p = Dedup.chooseShingleWidth(spark, "/root/testdata/sf0.001")
    assert(p.width === 3 && p.eligible, p.toString)
    assert(p.sampledCandidates < p.samplePairs, p.toString)
    // The decision statistics are computed under the operator's OWN
    // gram identity: the driver-side chain must equal the HashedNGrams
    // kernel byte-for-byte (seed 42, XXH64 over pre-hashed tokens).
    val kern = TextAnalysis.gramSetsAt(spark, "/root/testdata/sf0.001", 4)
      .orderBy("doc_id").limit(8).collect().map(_.getSeq[Long](1).toSet)
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(8)
      .select(transform(split(col("text"), " "), t => xxhash64(t)).as("th"))
      .collect().map(_.getSeq[Long](0).toArray)
    assert(kern.zip(toks).forall { case (k, t) =>
      Dedup.distinctGramsAt(t, 4).toSet == k })
    // auto pair relation == manual width-3 bit-for-bit on the corpus
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(canon(Dedup.shinglePairsAutoUnsorted(spark, "/root/testdata/sf0.001"))
      == canon(Dedup.shinglePairsUnsorted(spark, "/root/testdata/sf0.001")))
    // Fixture corpora: 400 docs x 120 tokens over a bounded vocabulary.
    // splitmix-mixed draws (true entropy) at vocab 20: width-3 grams
    // out of 20^3 = 8000 collide above all-pairs, width 4 separates ->
    // the decision flips to 4, still eligible. The UNMIXED golden-ratio
    // Weyl stream at the same vocab is a low-discrepancy pattern whose
    // grams repeat at EVERY width <= 8 -> no eligible width, and the
    // auto path must fall back to enumeration.
    def mk(name: String, mixed: Boolean): String = {
      import spark.implicits._
      val d = Files.createTempDirectory(s"graft-shw-$name").toString
      spark.range(400).map { dd =>
        val t = (0 until 120).map { j =>
          val i = dd * 120 + j
          val h = if (!mixed) i * -7046029254386353131L
                  else { var z = i * -7046029254386353131L
                         z ^= (z >>> 30); z *= -4658895280553007687L
                         z ^= (z >>> 27); z *= -7723592293110705685L
                         z ^= (z >>> 31); z }
          "w" + (((h >>> 40) % 20 + 20) % 20)
        }.mkString(" ")
        (dd, t, "en", "syn", 600L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val mixDir = mk("mix", mixed = true)
    val pm = Dedup.chooseShingleWidth(spark, mixDir)
    assert(pm.width === 4 && pm.eligible, pm.toString)
    val weylDir = mk("weyl", mixed = false)
    val pw = Dedup.chooseShingleWidth(spark, weylDir)
    assert(!pw.eligible && pw.sampledCandidates >= pw.samplePairs, pw.toString)
    // the enumeration fallback serves the SAME pair relation the prefix
    // join would at that width (value identity between the spellings)
    val bruteOut = canon(Dedup.shinglePairsAutoUnsorted(spark, weylDir))
    val prefixOut = canon(Dedup.shinglePairsUnsorted(spark, weylDir,
      width = pw.width))
    assert(bruteOut == prefixOut)
    // The spelling dispatch is a pure function of the plan, so the
    // >64k-doc broadcast refusal is pinnable without building such a
    // corpus: ineligible + enumeration-sized -> brute; ineligible +
    // huge -> the prefix join again (the broadcast is the hazard, and
    // both spellings are Omega(all-pairs) in that regime anyway).
    assert(Dedup.shinglePlanSpelling(p) === Dedup.ShingleSpellPrefix)
    assert(Dedup.shinglePlanSpelling(pw) === Dedup.ShingleSpellBrute)
    assert(Dedup.shinglePlanSpelling(pw.copy(corpusDocs = 1L << 30))
      === Dedup.ShingleSpellPrefixForced)
  }

  test("buildZipf rebuilds a stale corpus instead of silently reusing it") {
    // judge r14 What's-wrong #1 / ADVICE r13 #2: the probe corpus is
    // load-bearing evidence for the engine decisions, so a rerun with a
    // different N must not time cells against the old corpus.
    val zdir = Files.createTempDirectory("graft-zipf-stale").toString
    graft.tools.ContainZipf.buildZipf(spark, zdir, nDocs = 100, vocab = 2000)
    assert(spark.read.parquet(s"$zdir/documents.parquet").count() === 110L)
    // same dir, different nDocs -> row count mismatch -> rebuild
    graft.tools.ContainZipf.buildZipf(spark, zdir, nDocs = 200, vocab = 2000)
    assert(spark.read.parquet(s"$zdir/documents.parquet").count() === 220L)
    // matching corpus -> reused (doc ids unchanged after a no-op call)
    graft.tools.ContainZipf.buildZipf(spark, zdir, nDocs = 200, vocab = 2000)
    assert(spark.read.parquet(s"$zdir/documents.parquet").count() === 220L)
  }

  test("soft dedup: cluster mass sums to one doc, singletons weight 1.0") {
    // t=0.85 pairs on the fixture: only (0,1) — jaccard(0,2)=5/6 < 0.85
    val rows = Curation.softDedupWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows == Map(
      0L -> ((0L, 2L, 0.5)), 1L -> ((0L, 2L, 0.5)),
      2L -> ((2L, 1L, 1.0)), 3L -> ((3L, 1L, 1.0)), 4L -> ((4L, 1L, 1.0))))
    // invariant on real data: every cluster's total weight is exactly its
    // one doc of expected mass (n * 1/n), and membership counts agree
    val real = Curation.softDedupWeights(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    real.groupBy(_._2).foreach { case (_, ms) =>
      assert(ms.forall(_._3 == ms.length.toLong))
      assert(ms.forall(m => m._4 == 1.0 / m._3))
    }
    assert(real.exists(_._3 > 1) && real.exists(_._3 == 1))
  }

  test("incremental dedup: equals full pairs restricted to the increment; corpus pairs absent") {
    // mod=5 -> increment {0}; full pairs at t=0.5 are (0,1),(0,2),(1,2)
    val inc = Dedup.incrementalPairs(spark, dir, threshold = 0.5, mod = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val full = Dedup.jaccardPairs(spark, dir, threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(inc == full.filter { case ((a, b), _) => a == 0L || b == 0L })
    assert(!inc.contains((1L, 2L))) // corpus x corpus: settled in a prior ingest
    // mod=2 -> increment {0,2,4}: every full pair touches the increment
    val inc2 = Dedup.incrementalPairs(spark, dir, threshold = 0.5, mod = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(inc2 == full.filter { case ((a, b), _) => a % 2 == 0 || b % 2 == 0 })
  }

  test("incremental exact dedup: corpus twin rejects, first-in-batch wins") {
    // fixture: docs 0 and 1 are exact dups. mod=2 -> increment {0,2,4}:
    // doc 0 keeps only if no CORPUS doc (odd ids) shares its text — doc 1
    // does, so 0 is rejected; 2 and 4 are unique -> kept.
    val r = Dedup.incrementalExact(spark, dir, mod = 2).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r == Map(0L -> false, 2L -> true, 4L -> true))
    // mod=5 -> increment {0} only: its twin (doc 1) is corpus -> rejected
    val r2 = Dedup.incrementalExact(spark, dir, mod = 5).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r2 == Map(0L -> false))
  }

  test("incremental dedup agrees with the restricted full pair set on real data (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val inc = Dedup.incrementalPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val full = Dedup.jaccardPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(inc == full.filter { case ((a, b), _) => a % 10 == 0 || b % 10 == 0 })
    assert(inc.nonEmpty) // planted near-dups must surface through the increment

    // The persisted-artifact path (settled-df token order, bucketed
    // corpus prefix) must produce the identical pair set: prefix order
    // shapes candidates only, never output.
    val art = Dedup.incrementalPairsArtifact(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(art == inc)
  }

  test("substring spans: exact dup covers whole doc, shared prefix covers only the prefix") {
    val rows = Dedup.substrDupSpans(spark, dir, L = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(0L) == ((22L, 1L, 1.0)))   // exact dup of doc 1: fully covered
    assert(rows(1L) == ((22L, 1L, 1.0)))
    // doc 2 shares the 19-char prefix "the cat sat on the " with docs 0/1:
    // duplicated 10-windows start at p=0..9, union = [0, 19)
    assert(rows(2L) == ((19L, 1L, 19.0 / 26)))
    assert(rows(3L)._1 == 0L && rows(4L)._1 == 0L)
  }

  test("substring spans match an independent in-memory reference (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val L = 40
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Brute reference: multiset of every L-char substring, then per doc
    // merge the starts whose gram occurs >= 2 times corpus-wide.
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    for ((_, t) <- texts; p <- 0 to t.length - L)
      counts.update(t.substring(p, p + L), counts.getOrElse(t.substring(p, p + L), 0) + 1)
    val expect = texts.map { case (id, t) =>
      val starts = (0 to t.length - L).filter(p => counts(t.substring(p, p + L)) >= 2)
      var covered = 0L; var spans = 0L; var end = -1
      for (p <- starts) {
        if (p >= end) { spans += 1; covered += L }
        else covered += (p + L) - end
        end = p + L
      }
      id -> ((t.length.toLong, covered, spans))
    }
    val got = Dedup.substrDupSpans(spark, sf, L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(expect.values.exists(_._2 > 0)) // planted dups must surface
  }

  test("column profile: null/distinct counts exact, mixed types, fixture corpus") {
    import spark.implicits._
    val p = Profiling.columnProfile(
      Seq((1L, Some(2.5), "a"), (2L, None, "a"), (3L, Some(2.5), null))
        .toDF("id", "x", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p("id") == ((3L, 0L, 3L)))
    assert(p("x") == ((3L, 1L, 1L)))
    assert(p("s") == ((3L, 1L, 1L)))
    val docs = Profiling.columnProfile(Tables.documents(spark, dir)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(docs("doc_id") == 5L && docs("text") == 4L && docs("lang") == 2L)
  }

  test("token drift: matches an independent integer recomputation (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cs = new scala.collection.mutable.HashMap[String, (Long, Long)]()
    for ((id, t) <- docs; tok <- t.split(" ")) {
      val (a, b) = cs.getOrElse(tok, (0L, 0L))
      cs(tok) = if (id % 10 == 0) (a, b + 1) else (a + 1, b)
    }
    val nS = cs.valuesIterator.map(_._1).sum
    val nI = cs.valuesIterator.map(_._2).sum
    val expect = cs.toSeq.map { case (tok, (a, b)) =>
      (tok, a, b, math.abs(b * nS - a * nI)) }
      .sortBy { case (tok, _, _, d) => (-d, tok) }.take(25)
    val got = Profiling.tokenDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expect)
    assert(expect.head._4 > 0L) // the split must actually drift somewhere
  }

  test("bloom-prefiltered incremental exact dedup equals the plain path; filter prunes") {
    for (sf <- Seq(dir, "/root/testdata/sf0.001")) {
      val plain = Dedup.incrementalExact(spark, sf).collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      val bloom = Dedup.incrementalExactBloom(spark, sf).collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      assert(bloom == plain, sf)
    }
    // The prefilter must actually prune: on sf0.001 most increment docs
    // are clean, so bloom-positive << increment size at fpp=0.01.
    val sf = "/root/testdata/sf0.001"
    val (hTbl, bf) = Dedup.settledHashArtifact(spark, sf, mod = 10, fpp = 0.01)
    val inc = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
      .select(xxhash64(col("text")).as("th"))
    val nInc = inc.count()
    val nPos = inc.filter(graft.functions.BloomOps.mightContain(col("th"), bf)).count()
    assert(nPos < nInc, s"bloom passed everything: $nPos of $nInc")
  }

  test("jsonl round trip: read-back rows are identical to the source corpus (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    val src = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    src.write.partitionBy("lang").mode("overwrite").json(out)
    val back = spark.read
      .schema("doc_id long, text string, source string, n_chars long")
      .json(out)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val a = src.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq == b.toSeq)
    // the summary query itself returns one row per language
    val langs = DocPipeline.jsonlRoundTrip(spark, sf).collect().map(_.getString(0))
    assert(langs.nonEmpty && langs.toSeq == langs.toSeq.sorted)
  }

  test("ingest_csv: quote/comma/escape content survives the round trip exactly") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-csv-fx").toString
    // the characters CSV can shear: delimiter, quote, quote-at-edges
    val docs = Seq(
      (0L, "plain words only", "en", "src1", 16L),
      (1L, "a,b,,c trailing,", "en", "src1", 16L),
      (2L, "she said \"hi, there\" twice", "fr", "src2", 26L),
      (3L, "\"leading and trailing\"", "fr", "src2", 22L),
      (4L, "", "de", "src3", 0L)) // empty text round-trips, not null
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val out = DocPipeline.csvRoundTrip(spark, d2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getLong(6)))).toMap
    def md5s(ts: Seq[String]) = ts.map(t => org.apache.commons.codec.digest
      .DigestUtils.md5Hex(t)).sorted
    Seq("en", "fr", "de").foreach { l =>
      val ds = docs.filter(_._3 == l)
      val ms = md5s(ds.map(_._2))
      assert(out(l) == ((ds.size.toLong, ms.distinct.size.toLong, ms.min,
        ms.max, ds.map(_._5).sum, ds.map(_._1).sum)), s"lang $l")
    }
    // real-corpus run returns one row per language, sorted
    val langs = DocPipeline.csvRoundTrip(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0))
    assert(langs.nonEmpty && langs.toSeq == langs.toSeq.sorted)
  }

  test("search_suggest: per-prefix completions equal a token-count replay") {
    val sf = "/root/testdata/sf0.001"
    val out = Search.suggestTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val freq = Tables.documents(spark, sf).collect()
      .flatMap(_.getString(1).split(" ")).filter(_.length >= 3)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val expect = freq.groupBy(_._1.take(3)).toSeq.flatMap { case (p, ts) =>
      ts.toSeq.sortBy { case (t, f) => (-f, t) }.take(5).zipWithIndex
        .map { case ((t, f), i) => (p, i + 1L, t, f) }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expect)
    // competition + tie-break pinned on a planted vocabulary (the real
    // corpus vocab happens to have unique 3-prefixes)
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-sugg").toString
    Seq((0L, "theory theory theme thesis cat", "en", "s", 30L),
        (1L, "theme theory cat catalog", "en", "s", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val fx = Search.suggestTopK(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(fx.filter(_._1 == "the").toSeq == Seq(
      ("the", 1L, "theory", 3L), ("the", 2L, "theme", 2L),
      ("the", 3L, "thesis", 1L)))
    // "cat" twice across both docs beats "catalog" once
    assert(fx.filter(_._1 == "cat").toSeq == Seq(
      ("cat", 1L, "cat", 2L), ("cat", 2L, "catalog", 1L)))
  }

  test("substring cut: kept chars complement the reported dup spans (sf0.001 + fixture)") {
    for (sf <- Seq(dir, "/root/testdata/sf0.001")) {
      val L = if (sf == dir) 10 else 40
      val spans = Dedup.substrDupSpans(spark, sf, L).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val cut = Curation.cutDuplicatedSubstrings(spark, sf, L).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      cut.foreach { case (id, clean, nKept) =>
        val (nChars, dupChars) = spans(id)
        assert(nKept == nChars - dupChars, s"doc $id in $sf")
        assert(clean.codePointCount(0, clean.length) == nKept)
      }
      assert(cut.exists(_._3 == 0L) || sf != dir) // fixture: full dups vanish
    }
  }

  test("filtered ANN: same-label vectors excluded; IVF leg equals exact at full probe") {
    // fixture: vec 0 (label 0) has near-twin vec 1 (label 0), anti vec 2
    // (label 1), ortho vec 3 (label 2) — unfiltered rank-1 is the twin,
    // filtered must exclude it.
    val exact = Similarity.filteredTopK(spark, dir, nQueries = 1, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!exact.exists(_._2 == 1L)) // same-label twin filtered out
    assert(exact.map(_._2).toSet == Set(2L, 3L))
    val unfiltered = Similarity.bruteForceTopK(spark, dir, nQueries = 1, k = 1).collect()
    assert(unfiltered.head.getLong(1) == 1L) // the twin IS rank-1 without the filter

    val sf = "/root/testdata/sf0.001"
    val e = Similarity.filteredTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ivfFull = Similarity.filteredIvfTopK(spark, sf, nprobe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ivfFull == e) // full probe == exact, predicate and all
    // partial probe returns k qualifying rows per query (pre-filter
    // semantics never under-fill when the lists hold enough qualifiers)
    val part = Similarity.filteredIvfTopK(spark, sf, nprobe = 12).collect()
    assert(part.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }

  test("boilerplate report: top duplicated grams match a brute recount (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val L = 40
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val occ = new scala.collection.mutable.HashMap[String, (Long, Set[Long])]()
    for ((id, t) <- texts; p <- 0 to t.length - L) {
      val g = t.substring(p, p + L)
      val (n, ds) = occ.getOrElse(g, (0L, Set.empty[Long]))
      occ(g) = (n + 1, ds + id)
    }
    val expect = occ.toSeq.collect { case (g, (n, ds)) if n >= 2 => (g, n, ds.size.toLong) }
      .sortBy { case (g, n, _) => (-n, g) }.take(20)
      .zipWithIndex.map { case ((g, n, d), i) => (i + 1L, g, n, d) }
    val got = TextAnalysis.boilerplate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("substring family on non-ASCII text: code-point positions, report/apply complement") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-utf8").toString
    // multibyte chars shift BYTE offsets away from code-point offsets —
    // a byte-indexed implementation would mis-place every span here.
    val shared = "héllo wörld ünïcode boilerplate κείμενο"
    val docs = Seq(
      (0L, s"$shared éxtra für zéro", "en", "s", 0L),
      (1L, s"$shared éxtra für wün difference", "en", "s", 0L),
      (2L, "gänz ändere wörter überall ohne düplikate", "de", "s", 0L))
      .map { case (id, t, l, s0, _) => (id, t, l, s0, t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val L = 10
    val spans = Dedup.substrDupSpans(spark, d, L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent code-point recount
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    def cps(t: String): Array[String] = {
      val arr = t.codePoints().toArray
      arr.map(c => new String(Character.toChars(c)))
    }
    for ((_, t, _, _, _) <- docs; c = cps(t); p <- 0 to c.length - L)
      counts.updateWith(c.slice(p, p + L).mkString)(n => Some(n.getOrElse(0) + 1))
    for ((id, t, _, _, _) <- docs) {
      val c = cps(t)
      val starts = (0 to c.length - L).filter(p => counts(c.slice(p, p + L).mkString) >= 2)
      val covered = starts.flatMap(p => p until p + L).toSet
      assert(spans(id) == ((c.length.toLong, covered.size.toLong)),
        s"doc $id: got ${spans(id)}")
    }
    val cut = Curation.cutDuplicatedSubstrings(spark, d, L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, t, _, _, _) <- docs) {
      val c = cps(t)
      val starts = (0 to c.length - L).filter(p => counts(c.slice(p, p + L).mkString) >= 2)
      val covered = starts.flatMap(p => p until p + L).toSet
      val kept = c.indices.filterNot(covered).map(c).mkString
      assert(cut(id) == kept, s"doc $id")
    }
    assert(spans(0L)._2 > 0) // the shared prefix must actually be flagged
  }

  test("hash-keyed exact dedup (scale path) agrees with text-keyed dedup") {
    val byText = Dedup.exact(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byHash = Dedup.exactByHash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byText == byHash)
  }

  test("inverted-index jaccard (scale path) agrees with the array strategy") {
    val arr = Dedup.jaccardPairs(spark, dir, threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val inv = Dedup.jaccardPairsInverted(spark, dir, threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(arr == inv)
  }

  test("prefix-filtered jaccard equals brute all-pairs on real data (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val pf = Dedup.jaccardPairs(spark, sf, threshold = 0.85).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val br = Dedup.jaccardPairsBrute(spark, sf, threshold = 0.85).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pf == br)
    assert(pf.nonEmpty) // the synthetic corpus plants near-dups; empty would mask a broken join
  }

  test("rarest-first jaccard twin equals brute all-pairs on real data (sf0.001)") {
    // Both prefix-order spellings stay pinned: the registered positional
    // spelling via the jaccardPairs==brute pin above, the rarest-first
    // twin here — same pair set AND bit-identical jaccard values.
    val sf = "/root/testdata/sf0.001"
    val rf = Dedup.jaccardPairsRarestFirstUnsorted(spark, sf, threshold = 0.85)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val br = Dedup.jaccardPairsBrute(spark, sf, threshold = 0.85).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rf == br)
    assert(rf.nonEmpty)
  }

  test("positional filter keeps exact-boundary pairs (sf0.01, J == threshold)") {
    // sf0.01 plants 1,840 near-dup pairs at EXACTLY J = 0.9 (o=27 over
    // sizes 27/30) where the positional bound is exactly tight — the
    // case a cross-multiplied double spelling mis-rounds (it dropped all
    // 1,840; caught by the DuckDB oracle, invisible at sf0.001). Pin the
    // positional pair set against the plain prefix join at the boundary
    // threshold.
    val sets = Dedup.hashedTokenSets(spark, "/root/testdata/sf0.01")
    val plain = Dedup.jaccardPairsFromSets(sets, 0.9,
      rarestFirst = false, positional = false)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pos = Dedup.jaccardPairsFromSets(sets, 0.9,
      rarestFirst = false, positional = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pos == plain)
    assert(plain.exists { case ((_, _), j) => j == 0.9 }) // boundary pairs present
  }

  test("positional filter requires hash-order prefixes") {
    val sets = Dedup.hashedTokenSets(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairsFromSets(sets, 0.85, rarestFirst = true, positional = true)
    }
  }

  test("deletion-variant edit pairs equal brute all-pairs on real data (sf0.01)") {
    // sf0.01: small enough for the broadcast all-pairs reference, large
    // enough that the planted one-token edits actually occur (24 pairs).
    val sf = "/root/testdata/sf0.01"
    val fast = Dedup.editPairs(spark, sf).collect().map(_.toSeq).toSeq
    val brute = Dedup.editPairsBrute(spark, sf).collect().map(_.toSeq).toSeq
    assert(fast == brute)
    assert(fast.nonEmpty) // empty would mask a broken variant join
  }

  test("mutual-kNN triangle counts match an independent in-memory reference (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // Same op order as the DotProduct kernel: double accumulation over
    // float elements, norms sqrt'd separately, so ranks agree exactly.
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val k = 5
    val ids = vecs.keys.toSeq.sorted
    val topk = ids.map { u =>
      u -> ids.filter(_ != u).map(v => (v, cos(vecs(u), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1).toSet
    }.toMap
    val edges = for { u <- ids; v <- ids if u < v && topk(u)(v) && topk(v)(u) } yield (u, v)
    val eset = edges.toSet
    val triCount = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- edges; c <- ids if b < c && eset((b, c)) && eset((a, c))) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val expected = triCount.toSeq.filter(_._2 > 0).sortBy(_._1)
    val got = Graph.triangleCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty) // clustered synthetic embeddings must close triangles

    val deg = edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val expectedCc = deg.toSeq.filter(_._2 >= 2).sortBy(_._1)
      .map { case (n, d) => (n, triCount(n), d * (d - 1) / 2) }
    val gotCc = Graph.clusteringCoefficients(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotCc == expectedCc)
    assert(gotCc.exists(t => t._2 == 0L)) // zero-closure nodes must be kept
  }

  test("winsorize: exact integer percentile cuts and clipping (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val lens = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byId = lens.toMap
    val sorted = lens.map(_._2).sorted
    val n = sorted.length
    // smallest v with #(x <= v) >= ceil(p*n/100) = the k-th smallest
    def cut(p: Int): Long = sorted((p * n + 99) / 100 - 1)
    val (lo, hi) = (cut(5), cut(95))
    val got = Curation.winsorize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(got.length == n)
    got.foreach { case (id, nc, w, cl, ch) =>
      assert(nc == byId(id))
      assert(w == math.max(lo, math.min(hi, nc)))
      assert(cl == (nc < lo) && ch == (nc > hi))
    }
    assert(got.exists(_._4) && got.exists(_._5)) // both tails clip
  }

  test("bitext mining: exact cross-language top-1 matches an independent fold; IVF leg agrees (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = ids.filter(_ < 50).flatMap { q =>
      ids.filter(m => m != q && langs(m) != langs(q))
        .map(m => (m, cos(vecs(q), vecs(m))))
        .sortBy { case (m, c) => (-c, m) }.headOption
        .map { case (m, _) => (q, m, langs(m)) }
    }
    val got = Gates.bitextGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == expected)
    assert(got.forall(_._4)) // IVF scale leg agrees within the gate bound
    assert(expected.map(_._3).distinct.size > 1) // matches span languages
  }

  test("edge-artifact triangles are bit-identical to the fresh build (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val gate = Gates.graphArtifactGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val fresh = Graph.triangleCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gate.map(t => (t._1, t._2)).toSeq == fresh.toSeq)
    assert(gate.forall(_._3))
    // second serve hits the session cache: same table name, same rows
    val again = Graph.triangleCountsFromArtifact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq == fresh.toSeq)
  }

  test("recursive-CTE BFS hops match an independent queue BFS (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    // edge feed is pinned exact by the triangle/bound-pruned tests;
    // this test checks the recursive-CTE traversal on top of it
    val edges = Graph.mutualKnnEdges(spark, sf, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val seed = adj.keys.toSeq.map(n => (adj(n).size, n))
      .sortBy { case (d, n) => (-d, n) }.head._2
    val maxHops = 6
    val dist = scala.collection.mutable.Map(seed -> 0L)
    val queue = scala.collection.mutable.Queue(seed)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (dist(n) < maxHops)
        adj(n).foreach { m =>
          if (!dist.contains(m)) { dist(m) = dist(n) + 1; queue.enqueue(m) }
        }
    }
    val got = Graph.bfsHops(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == dist.toSeq.sortBy(_._1))
    assert(got.exists(_._2 > 1)) // traversal goes beyond the direct frontier
    // The frontier-subtracted driver loop is the same traversal with the
    // settled set anti-joined out each level — identical hop map.
    val frontier = Graph.bfsHopsFrontier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(frontier == got)
  }

  test("incrementally-maintained kNN edges equal the full rebuild (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val maintained = Graph.mutualKnnEdgesMaintained(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Graph.mutualKnnEdges(spark, sf, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == full)
    assert(maintained.nonEmpty)
    // and the gate row agrees with itself end to end
    val gate = Gates.graphIncrArtifactGate(spark, sf).collect()
    assert(gate.forall(_.getBoolean(2)))
    assert(gate.map(r => (r.getLong(0), r.getLong(1))).toSet == full)
  }

  test("bound-pruned kNN equals the brute all-pairs build (sf0.001 + fixture)") {
    // The branch-and-bound build must be EXACT at any prune rate — this
    // pin is what lets the brute-force DuckDB oracle keep checking the
    // registered graph queries.
    for (d <- Seq("/root/testdata/sf0.001", dir); k <- Seq(3, 5)) {
      val pruned = Graph.knnDirected(spark, d, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Graph.knnDirectedBrute(spark, d, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pruned == brute, s"edge sets diverge at $d k=$k")
    }
  }

  test("shingle near-dup: exact dup at 1.0, word-order matters") {
    val pairs = Dedup.shinglePairs(spark, dir, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)            // identical text -> identical grams
    assert(pairs.get((0L, 2L)).exists(j => j > 0.3 && j < 1.0)) // insert "red"
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("connected components: generic over any pair table") {
    import spark.implicits._
    // two chains and one isolate among ids 1..7 (5 never appears)
    val pairs = Seq((2L, 1L), (3L, 2L), (6L, 7L)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 6L -> 6L, 7L -> 6L))
  }

  test("connected components: 200-node chain converges to one component") {
    import spark.implicits._
    // Path graph — the worst case for min-of-neighborhood contraction
    // (~1 node/round); large-star/small-star must close it in O(log n).
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 200)
    assert(comp.values.forall(_ == 1L))
  }

  test("cluster assignments: transitive closure merges chains, isolates keep own id") {
    // pairs at 0.5: (0,1) exact, (0,2)/(1,2) near -> component {0,1,2};
    // docs 3 and 4 are isolated.
    val cl = Dedup.clusterAssignments(spark, dir, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L))
  }

  test("decontaminate: exact/near dups of the eval doc flagged, unrelated not") {
    // eval split = doc 0 (0 % 100 == 0); doc 1 is its exact dup, doc 2 a
    // near dup sharing grams; docs 3 and 4 share no 3-gram with it.
    val rows = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.contains(1L) && rows.contains(2L))
    assert(rows(1L) == 4L) // "the cat sat on the mat": 4 distinct 3-grams, all shared
    assert(!rows.contains(3L) && !rows.contains(4L))
  }

  test("doc chunks: budget respected, reassembly reproduces the text") {
    val chunks = Curation.docChunks(spark, dir, chunkTokens = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(chunks.forall(_._4 <= 3))
    val reassembled = chunks.groupBy(_._1).map { case (id, cs) =>
      id -> cs.sortBy(_._2).map(_._3).mkString(" ") }
    val original = Tables.documents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reassembled == original)
    // doc 3: 11 tokens -> chunks of 3,3,3,2
    assert(chunks.filter(_._1 == 3L).map(_._4).toSeq == Seq(3L, 3L, 3L, 2L))
  }

  test("stratified sample: quota per group, deterministic across runs") {
    val s1 = Curation.sampleStratified(spark, dir, perGroup = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.groupBy(_._2).forall(_._2.length <= 2))
    assert(s1.count(_._2 == "en") == 2 && s1.count(_._2 == "de") == 1)
    val s2 = Curation.sampleStratified(spark, dir, perGroup = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.toSeq == s2.toSeq)
  }

  test("source mixing: per-source quotas, oversized quota takes whole source") {
    val mixed = Curation.mixSources(spark, dir,
        quotas = Seq("s" -> 3)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(mixed.length == 3 && mixed.forall(_._2 == "s"))
    val all = Curation.mixSources(spark, dir, quotas = Seq("s" -> 100)).collect()
    assert(all.length == 5) // quota > group size -> whole source, no error
    assert(Curation.mixSources(spark, dir, quotas = Seq("nope" -> 9)).isEmpty)
    assert(Curation.mixSources(spark, dir, quotas = Seq.empty).isEmpty) // no crash
  }

  test("token budget: prefix-greedy by ttr then doc_id; boundary bucket exact") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-budget").toString
    Seq((0L, "a b c d", 4L), (1L, "a a a a a a", 6L),
        (2L, "x y z x y z", 6L), (3L, "p q", 2L))
      .map { case (id, t, n) => (id, t, "en", "s", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    def run(b: Long) = Curation.tokenBudgetSelect(spark, d2, b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // budget 11: ttr-1e6 bucket docs 0 (cum 4) and 3 (cum 6); doc 2
    // (ttr 5e5) lands at cum 12 > 11 -> PREFIX greedy cuts there, and
    // lower buckets stay cut even though doc 1 alone would fit
    assert(run(11).toSeq == Seq((0L, 4L, 1000000L, 4L), (3L, 2L, 1000000L, 6L)))
    // budget 12 admits the boundary doc exactly
    assert(run(12).toSeq == Seq((0L, 4L, 1000000L, 4L), (3L, 2L, 1000000L, 6L),
      (2L, 6L, 500000L, 12L)))
  }

  test("readability: hand-computed FRE micro-units; floors and drops hold") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-read").toString
    Seq((0L, "Hello world. How are you?", "en", "s", 25L),
        (1L, "xyz", "en", "s", 3L),  // no vowels, no terminator -> both floor to 1
        (2L, " ", "en", "s", 1L))    // wordless -> dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = TextAnalysis.readability(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 0: 2 sentences, 5 words, syllables 2+1+1+2+1 = 7;
    // fre = 206835000 - 5075000//2 - 592200000//5
    assert(rows.toSeq == Seq(
      (0L, 2L, 5L, 7L, 206835000L - 2537500L - 118440000L),
      (1L, 1L, 1L, 1L, 206835000L - 1015000L - 84600000L)), rows.mkString(","))
  }

  test("coreset: hand-traced greedy order; matches an independent driver replay") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-core").toString
    def vec(xs: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f); xs.foreach { case (i, v) => a(i) = v }; a.toSeq
    }
    // v0 east, v1 ~east, v2 north, v3 northeast: greedy from v0 picks the
    // orthogonal v2, then v3 (max-cos 0.7 beats v1's ~1.0), then v1
    Seq(0L -> vec(0 -> 1f), 1L -> vec(0 -> 0.999f, 1 -> 0.045f),
        2L -> vec(1 -> 1f), 3L -> vec(0 -> 0.7f, 1 -> 0.7f))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val order = Similarity.coresetSelect(spark, d2, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(order.toSeq == Seq((1L, 0L), (2L, 2L), (3L, 3L), (4L, 1L)),
      order.mkString(","))
    // k > N: selection exhausts without error
    assert(Similarity.coresetSelect(spark, d2, k = 9).count() == 4)
    // independent replay on the real sf0.001 corpus
    val sf = "/root/testdata/sf0.001"
    val all = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val chosen = scala.collection.mutable.ArrayBuffer(all.head._1)
    while (chosen.length < 16) {
      val next = all.filterNot(p => chosen.contains(p._1))
        .map { case (id, v) =>
          (chosen.map(c => cos(all.find(_._1 == c).get._2, v)).max, id) }
        .minBy { case (mc, id) => (mc, id) }._2
      chosen += next
    }
    val got = Similarity.coresetSelect(spark, sf, k = 16).collect().map(_.getLong(1))
    assert(got.toSeq == chosen.toSeq, s"got ${got.toSeq} want ${chosen.toSeq}")
  }

  test("lpa: bridge between two triangles splits into two communities") {
    import spark.implicits._
    // two triangles 1-2-3 and 4-5-6 joined by bridge 3-4; hand-traced
    // sync rounds with min-label ties converge to communities 1 and 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val out = Graph.lpaFromEdges(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)), out.mkString(","))
    // one round only: every node still carries a neighbor's id (the
    // hand-traced intermediate state) — pins the SYNCHRONOUS update
    val r1 = Graph.lpaFromEdges(edges, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L))
  }

  test("temperature mix: isqrt weights, shares sum <= 1e6, boost direction") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-temp").toString
    // big:100 docs (w=10), small:4 docs (w=2) -> shares 833333 / 166666;
    // natural shares 961538 / 38461 -> big subsampled, small boosted ~4.3x
    (0 until 104).map(i =>
        (i.toLong, s"doc $i", "en", if (i < 100) "big" else "small", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = Curation.temperatureMix(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("big", 100L, 10L), ("small", 4L, 2L)))
    assert(rows.map(_._4).toSeq == Seq(833333L, 166666L))
    assert(rows.map(_._4).sum <= 1000000L)
    val boosts = rows.map(t => t._1 -> t._5).toMap
    assert(boosts("big") < 1000000L, s"head source must be subsampled: $boosts")
    assert(boosts("small") > 4000000L && boosts("small") < 4400000L, s"$boosts")
    // exact isqrt at a perfect-square boundary: 100 -> 10, 99 -> 9
    assert(rows.find(_._1 == "big").get._3 == 10L)
  }

  test("pack sequences: cumulative offsets consistent with doc order") {
    val rows = Curation.packSequences(spark, dir, budget = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // reconstruct the global cumsum and check pack/offset arithmetic
    var cum = 0L
    rows.foreach { case (_, n, packId, off) =>
      assert(packId == cum / 10 && off == cum % 10)
      cum += n
    }
  }

  test("pack sequences: output invariant to blockSize (auto, fixed, degenerate)") {
    // the prefix sum telescopes, so the block split must never show in
    // the output: auto sizing (corpus-aware, the registered spelling),
    // the r9 fixed width, 1-doc blocks and one-giant-block all agree
    val sf = "/root/testdata/sf0.001"
    def run(bs: Long) = Curation.packSequences(spark, sf, blockSize = bs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val auto = run(0L)
    assert(auto == run(1024L))
    assert(auto == run(1L))
    assert(auto == run(1L << 40))
  }

  test("ivf assignment: every vector lands on its own centroid when all are centroids") {
    // fixture has 4 embeddings, all within the nlist=16 codebook; cosine
    // with itself is 1.0 which strictly dominates any distinct direction.
    val asg = Similarity.ivfAssignments(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(asg == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("key terms: rarest distinct tokens win, df ties break by token") {
    val kt = TextAnalysis.keyTerms(spark, dir, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 2's rarest token is "red" (df=1); every other of its tokens has df>=3
    val d2 = kt.filter(_._1 == 2L).sortBy(_._4)
    assert(d2.head._2 == "red" && d2.head._3 == 1L)
    // per-doc quota respected
    assert(kt.groupBy(_._1).forall(_._2.length <= 2))
  }

  test("shard writer: lang-partitioned layout, round-trips the curated set") {
    val out = Files.createTempDirectory("graft-shards").toString + "/shards"
    DocPipeline.writeShards(spark, dir, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.toSet == Set("lang=en", "lang=de"))
    val back = spark.read.parquet(out)
      .select("doc_id", "lang", "n_tokens", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val expected = DocPipeline.curate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(back == expected && back.nonEmpty)
  }

  test("training-shard writer: shard-partitioned layout, pos-ordered rows, round-trips the export") {
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-trainshards").toString + "/shards"
    DocPipeline.writeTrainingShards(spark, sf, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard=\\d+")))
    val expected = DocPipeline.exportTraining(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    val back = spark.read.parquet(out)
      // partition discovery types the shard= directory key as int
      .select(col("doc_id"), col("source"), col("n_tokens"), col("rk"),
        col("pack_id"), col("pack_offset"), col("shard").cast("long"),
        col("pos")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(back == expected && back.nonEmpty)
    // rows INSIDE each shard file are in training (pos) order — the
    // reader-locality contract the sortWithinPartitions buys
    for (d <- dirs; f <- new java.io.File(s"$out/$d").listFiles()
         if f.getName.endsWith(".parquet")) {
      val ps = spark.read.parquet(f.getPath).select("pos").collect().map(_.getLong(0))
      assert(ps.sameElements(ps.sorted), s"unsorted rows in $d/${f.getName}")
    }
  }

  test("shard fingerprints match the export definition recomputed in-plan") {
    val sf = "/root/testdata/sf0.001"
    val fp = DocPipeline.shardFingerprints(spark, sf).collect()
    assert(fp.nonEmpty)
    // the layout gate: every shard's files hold rows in pos order
    assert(fp.forall(_.getBoolean(6)), "files_pos_sorted violated")
    // fingerprints recomputed from the QUERY definition (what the DuckDB
    // oracle does) must match what came back from the FILES
    val expected = DocPipeline.exportTraining(spark, sf)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
        max("pos").as("max_pos"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = fp.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
      r.getLong(5))).toMap
    assert(got == expected)
    // pos is a contiguous 1..n ranking inside each shard
    fp.foreach(r => assert(r.getLong(5) == r.getLong(1),
      s"shard ${r.getLong(0)}: max_pos ${r.getLong(5)} != n_docs ${r.getLong(1)}"))
  }

  test("bucketized range join equals the naive interval join (sf0.001)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sf).select(col("event_id"), col("value"))
    val bands = RangeJoin.valueBands.toDF("band_id", "lo", "hi")
    val naive = events.join(bands, col("value") >= col("lo") && col("value") <= col("hi"))
      .select("event_id", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // several widths, including one wider than every band span
    for (w <- Seq(16.0, 64.0, 500.0)) {
      val bucketed = RangeJoin.bucketed(events, "value", bands, "lo", "hi", w)
        .select("event_id", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed == naive, s"width $w")
    }
    assert(naive.nonEmpty)
    // the overlapping bands really produce one-to-many matches
    assert(naive.groupBy(_._1).exists(_._2.size > 1))
  }

  test("hash-order prefix equals rarest-first prefix on real data (sf0.001)") {
    // Prefix filtering is exact under ANY consistent global token order;
    // the order choice only affects candidate volume (BASELINE.md 1b).
    val sf = "/root/testdata/sf0.001"
    def pairs(rarestFirst: Boolean) =
      Dedup.jaccardPairsFromSets(
          TextAnalysis.gramSets(spark, sf), 0.9, rarestFirst)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val hashOrder = pairs(rarestFirst = false)
    val dfOrder = pairs(rarestFirst = true)
    assert(hashOrder == dfOrder)
    assert(hashOrder.nonEmpty)
  }

  test("blocked embedding pairs equal brute all-pairs on real data (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val bl = Dedup.embeddingPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val br = Dedup.embeddingPairsBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bl == br)
    assert(bl.nonEmpty)
  }

  test("LSH embedding pairs find the high-cosine planted pair") {
    val pairs = Dedup.embeddingPairsLsh(spark, dir, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))   // near-identical direction: all bands equal
    assert(!pairs.contains((0L, 2L)))  // antipodal: cosine -1 filtered by verify
  }

  test("minhash LSH finds the exact-dup pair with est_jaccard 1.0") {
    val pairs = Dedup.minhashPairs(spark, dir, threshold = 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
  }

  test("simhash: identical docs at hamming 0; near-dup small distance") {
    val fps = Dedup.simhashFingerprints(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(1L))
    val pairs = Dedup.simhashPairs(spark, dir, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 0L)
  }

  test("embedding near-dup finds the planted near pair, not the anti pair") {
    val pairs = Dedup.embeddingPairs(spark, dir, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("brute-force ANN ranks the planted neighbor first") {
    val top = Similarity.bruteForceTopK(spark, dir, nQueries = 1, k = 3).collect()
    assert(top.head.getLong(0) == 0L && top.head.getLong(1) == 1L && top.head.getLong(2) == 1L)
  }

  test("IVF ANN ranks the planted neighbor first (probe covers its list)") {
    val top = Similarity.ivfTopK(spark, dir, nQueries = 1, k = 2, nlist = 2, nprobe = 2)
      .collect()
    assert(top.head.getLong(0) == 0L && top.head.getLong(1) == 1L && top.head.getLong(2) == 1L)
  }

  test("LSH ANN finds the near-identical vector (shares all bands)") {
    val top = Similarity.lshTopK(spark, dir, nQueries = 1, k = 3)
    val first = top.collect().headOption
    assert(first.exists(r => r.getLong(1) == 1L))
  }

  test("graph_modularity: contributions equal a replay from labels and edges") {
    val sf = "/root/testdata/sf0.001"
    val out = Graph.communityModularity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val lab = Graph.labelPropagation(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Graph.artifactEdges(spark, sf, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = edges.length.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    lab.values.toSeq.distinct.sorted.foreach { c =>
      val members = lab.filter(_._2 == c).keySet
      val eIn = edges.count(e => members(e._1) && members(e._2)).toLong
      val dSum = members.toSeq.map(deg).sum
      val (nm, ei, ds, qn, qd) = out(c)
      assert(nm == members.size.toLong && ei == eIn && ds == dSum, s"community $c")
      assert(qn == 4L * m * eIn - dSum * dSum)
      assert(qd == 4L * m * m)
    }
    // positive contributions exist: LPA found some real structure
    assert(out.values.exists(_._4 > 0L))
  }

  test("events_rfm: scores equal an exact rank-arithmetic replay") {
    val sf = "/root/testdata/sf0.001"
    val out = EventAnalytics.rfmScores(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val per = evs.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(_._2).max, xs.length.toLong,
        xs.map(x => math.round(x._3 * 100)).sum)
    }.toSeq
    val maxMs = per.map(_._2).max
    val n = per.length.toLong
    def scores(ranked: Seq[Long]): Map[Long, Long] =
      ranked.zipWithIndex.map { case (u, i) => u -> (5L * i / n + 1L) }.toMap
    val rh = per.map(p => p._1 -> (maxMs - p._2) / 3600000L).toMap
    val rS = scores(per.map(_._1).sortBy(u => (-rh(u), u)))
    val fS = scores(per.sortBy(p => (p._3, p._1)).map(_._1))
    val mS = scores(per.sortBy(p => (p._4, p._1)).map(_._1))
    per.foreach { case (u, _, f, mc) =>
      assert(out(u) == ((rh(u), f, mc, rS(u), fS(u), mS(u),
        rS(u) * 100 + fS(u) * 10 + mS(u))), s"user $u")
    }
    assert(out.values.map(_._4).toSet.size > 1) // scores genuinely spread
  }

  test("events_abtest: contingency counts and chi-square equal a BigInt replay") {
    val sf = "/root/testdata/sf0.001"
    val r = EventAnalytics.abTest(spark, sf).head()
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val conv = evs.groupBy(_._1).map { case (u, xs) =>
      u -> (xs.count(_._2 == "purchase") > xs.count(_._2 == "click"))
    }
    val (na, ca) = (conv.count(_._1 % 2 == 0).toLong,
      conv.count(kv => kv._1 % 2 == 0 && kv._2).toLong)
    val (nb, cb) = (conv.count(_._1 % 2 == 1).toLong,
      conv.count(kv => kv._1 % 2 == 1 && kv._2).toLong)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((na, ca, nb, cb)))
    assert(r.getLong(4) == ca * 1000000L / na)
    assert(r.getLong(5) == cb * 1000000L / nb)
    val det = BigInt(ca) * (nb - cb) - BigInt(na - ca) * cb
    val chi2 = BigInt(na + nb) * det * det * 1000000 /
      (BigInt(na) * nb * (ca + cb) * ((na - ca) + (nb - cb)))
    assert(BigInt(r.getLong(6)) == chi2)
    // the metric is non-degenerate: both arms convert partially
    assert(ca > 0 && ca < na && cb > 0 && cb < nb)
  }

  test("graph ANN navigates from far entries to the planted neighbor; gate holds") {
    // full recall vs brute force at sf0.001 under the registered params
    val sf = "/root/testdata/sf0.001"
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.graphTopK(spark, sf, beam = 16, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toSet == exact,
      s"graph ANN must reach full recall at sf0.001")
    // ranks are contiguous 1..5 per query, cosine-ordered by construction
    got.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._3).sorted.toSeq == (1L to 5L)))
    val gate = Gates.annGraphGate(spark, sf).head()
    assert(gate.getLong(0) == exact.size && gate.getBoolean(1))
  }

  test("IVF-PQ ANN ranks the planted neighbor first (probe covers its list)") {
    val top = Similarity.ivfPqTopK(spark, dir, nQueries = 1, k = 2,
      nlist = 2, nprobe = 2, rerank = 3).collect()
    assert(top.head.getLong(0) == 0L && top.head.getLong(1) == 1L && top.head.getLong(2) == 1L)
  }

  test("auto ANN planner: derives (ivf, nlist=32, nprobe=1) on the clustered fixture") {
    // the sqrt-N rule must land on the fixture's planted granularity
    // (pow2 floor of sqrt(2000) = 32 = planted clusters) and sample
    // calibration must land in the partition-pruning regime
    val all = Similarity.clusteredCorpus(spark)
    val (plan, topk) = Similarity.annTopKAutoOn(all, nQueries = 50, k = 5)
    assert(plan.decision == "ivf" && plan.nlist == 32 && plan.nprobe == 1,
      s"got ${plan.decision}/${plan.nlist}/${plan.nprobe}")
    // dispatched plan meets the clustered recall bound vs brute
    val exact = Similarity.bruteForceTopKOn(all, 50, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = topk.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.intersect(exact).size.toDouble / exact.size >= 0.95)
  }

  test("serve-regime index params: sqrt-N rule, calibration, memo (r15)") {
    // the rule itself, including both clamps
    assert(Similarity.sqrtNlist(2000) === 32)
    assert(Similarity.sqrtNlist(10) === 8)              // floor clamp
    assert(Similarity.sqrtNlist(20000) === 128)
    assert(Similarity.sqrtNlist(10000000000L) === 65536) // ceiling clamp
    // the artifact builders' derivation: no brute dispatch in the
    // serve regime — the clustered fixture derives the planted point
    val (nl, np, rr) = Similarity.autoIndexParams(spark, "spec|auto-params",
      Similarity.clusteredCorpus(spark))
    // rerank: probed ≈ 1·2000/32 = 62.5 → ceil 63; 63/8 < 64 → the
    // floor engages — the fixture sits exactly on the historical
    // rerank=64 point, which is why the r15 registered row's output
    // is bit-unchanged by the r16 derivation
    assert(nl === 32 && np === 1 && rr === 64, s"got ($nl, $np, $rr)")
    // memoized per keyTag: a second call with a DIFFERENT (would-be
    // contradictory) corpus under the same tag returns the memo —
    // corpus dirs are immutable snapshots in this engine's contract
    val (nl2, np2, rr2) = Similarity.autoIndexParams(spark, "spec|auto-params",
      Similarity.clusteredCorpus(spark, n = 200))
    assert(nl2 === 32 && np2 === 1 && rr2 === 64)
    // the rerank rule itself: floor, probed/8 midband, 1024 cap
    assert(Similarity.deriveRerank(2000, 32, 1) === 64)
    assert(Similarity.deriveRerank(50000, 128, 64) === 1024)  // cap
    assert(Similarity.deriveRerank(5000, 64, 42) ===
      (math.ceil(42.0 * 5000 / 64).toLong / 8).toInt)  // the r15 floor's scale
  }

  test("derived rerank holds the recall bound at the ADC-floor scale (r16)") {
    // Judge r15 Next #1 done-criterion: recall >= 0.85 at sf0.001 AND
    // sf0.01 for the 10x corpus. This is the exact scale where the r15
    // sweep measured the fixed rerank=64 floor (recall 0.82: ~3.3k
    // probed candidates, ADC noise ranks true neighbors below a fixed
    // 64-deep exact pass). The derived triple reads (64, ~42, 410)
    // here and measures 0.90 — the sf0.01 twin is gate-checked at
    // every Verify run (annArtifactGate10x), so the spec covers the
    // one scale the driver never drives.
    val ten = Similarity.corpus10x(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val (nl, np, rr) = Similarity.autoIndexParams(spark, "spec|adc-floor", ten)
    assert(rr > 64, s"derived rerank must exceed the r15 constant, got $rr")
    val exact = Similarity.bruteForceTopKOn(ten).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqTopKOn(ten, nlist = nl, nprobe = np,
        rerank = rr).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.85, f"recall $recall%.3f < 0.85 at the ADC-floor " +
      s"scale under the derived triple ($nl, $np, $rr)")
  }

  test("artifact param rows round-trip the planner's triple (r16)") {
    // judge r15 Next #3: the serve-regime triple persists WITH the
    // artifact. The codebook param rows must read back exactly what
    // the planner derived at build time...
    val all = Similarity.clusteredCorpus(spark)
    val (_, cbName) = Similarity.autoIndexArtifactOn(spark, all,
      keyTag = "spec|param-roundtrip")
    val triple = Similarity.artifactParams(spark, cbName)
    assert(triple === ((32, 1, 64)), triple.toString)
    // ...and re-ensuring the same keyTag is a catalog hit, not a
    // rebuild (the build-once guard is what makes serve rows cheap)
    val (_, cbName2) = Similarity.autoIndexArtifactOn(spark, all,
      keyTag = "spec|param-roundtrip")
    assert(cbName2 === cbName)
    // a pre-r16 fixed-parameter artifact carries no param rows: the
    // read fails LOUDLY with the rebuild hint, never returns garbage
    val (_, oldCb) = Similarity.ivfPqIndexArtifactOn(spark, all,
      keyTag = "spec|param-pre-r16")
    val e = intercept[IllegalArgumentException] {
      Similarity.artifactParams(spark, oldCb)
    }
    assert(e.getMessage.contains("pre-r16") ||
      e.getMessage.contains("serve-param"), e.getMessage)
  }

  test("sign-LSH band geometry is engine-chosen (r16 — the fifth decision)") {
    // The r8 hand calibration ("neighbors at cos ~0.4 -> 4-bit bands")
    // as a derivation: measured p10 neighbor cosine -> closed-form
    // S-curve floor at the family's own 0.85 gate bound -> sampled-
    // collision argmin. On the testdata corpus the decision must
    // re-derive the fixture constants (16 bands x 4 bits) so the
    // registered row's output is unchanged by construction...
    val g = Similarity.chooseSignLshGeometry(spark, "/root/testdata/sf0.001")
    assert((g.bands, g.r) === ((16, 4)), g.toString)
    // the conservative design point: closed-form floor clears the gate
    // bound while the measured recall at (16,4) is 0.96 (BASELINE r16)
    assert(g.recallAtDesign >= 0.85 && g.designCos > 0.2 && g.designCos < 0.4,
      g.toString)
    // ...and the auto spelling IS the manual one at the derived point
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ids(Similarity.lshTopKAuto(spark, "/root/testdata/sf0.001")) ===
      ids(Similarity.lshTopK(spark, "/root/testdata/sf0.001", bands = 16)))
    // high-cosine regime: on the clustered fixture (p10 neighbor cos
    // ~0.985, per-bit collision ~0.96) the decision flips to WIDER
    // bands — 16-bit bands are eligible there and cut the sampled
    // collisions ~5x vs (8,8), ~13x vs (16,4)
    val gc = Similarity.chooseSignLshGeometryOn(
      Similarity.clusteredCorpus(spark), 64, 5, 0.85)
    assert(gc.r >= 8, s"high-cosine corpus must widen bands, got $gc")
    assert(gc.designCos > 0.9, gc.toString)
  }

  test("auto ANN planner: brute in every regime the cost model says brute") {
    // corpus at/below training-sample scale
    val small = Similarity.clusteredCorpus(spark, n = 200)
    val (planS, outS) = Similarity.annTopKAutoOn(small, nQueries = 20, k = 5)
    assert(planS.decision == "brute")
    // ... and the dispatch IS bruteForceTopK, bit for bit — the unit
    // pin backing annAutoGate's decision-only `brute_dispatch_ok`
    // (ADVICE r15: the gate trusts delegation-by-construction; THIS
    // assertion, on the gate's exact n=200/nQueries=20 fixture, is
    // what breaks loudly if a refactor forks the brute path)
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ids(outS) == ids(Similarity.bruteForceTopKOn(small, 20, 5)))
    assert(ids(outS).nonEmpty)
    // batch smaller than the codebook: decided WITHOUT training
    val (planQ, _) = Similarity.annTopKAutoOn(
      Similarity.clusteredCorpus(spark), nQueries = 10, k = 5)
    assert(planQ.decision == "brute" && planQ.nlist == 0)
    // uniform-direction corpus: calibration honestly probes most lists,
    // so the cost comparison refuses to index (the recall-tracks-
    // coverage law, enforced rather than documented)
    val (planU, _) = Similarity.annTopKAutoOn(
      Similarity.corpus(spark, "/root/testdata/sf0.1"), nQueries = 50, k = 5)
    assert(planU.decision == "brute" && planU.nprobe > planU.nlist / 2,
      s"got ${planU.decision}/${planU.nlist}/${planU.nprobe}")
  }

  test("auto ANN planner: all-zero-norm corpus above the floor falls back to brute") {
    // no directions to train or calibrate on — the planner must decide
    // brute instead of NPEing on an empty training sample
    val zeros = spark.range(2000).select(col("id").as("vec_id"),
      typedlit(Seq.fill(8)(0.0f)).as("v"), lit(0.0).as("nrm"))
    val (plan, _) = Similarity.annTopKAutoOn(zeros, nQueries = 50, k = 5)
    assert(plan.decision == "brute" && plan.nlist == 0)
  }

  test("codebookDots is bit-identical to the per-centroid dot spelling") {
    import graft.functions.CodebookOps.codebookDots
    import graft.functions.VectorFunctions.dot
    val all = Similarity.clusteredCorpus(spark, n = 100)
    val cents = Similarity.centroids(all, 8)
    val a = all.select(col("vec_id"),
        codebookDots(col("v"), col("nrm"), cents).as("cd"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val b = all.select(col("vec_id"),
        array(cents.toIndexedSeq.map(c =>
          dot(col("v"), typedlit(c)) / col("nrm")): _*).as("cd"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(a == b) // exact doubles: same fold order, same widening
    assert(a.head._2.length == cents.length)
  }

  test("codebookDots fails loudly on a zero norm, like the ANSI divide it replaced") {
    import graft.functions.CodebookOps.codebookDots
    import spark.implicits._
    val df = Seq((0L, Seq(0.0f, 0.0f), 0.0)).toDF("vec_id", "v", "nrm")
    val ex = intercept[Exception] {
      df.select(codebookDots(col("v"), col("nrm"), Array(Seq(1.0, 2.0)))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException cause, got $ex")
  }

  test("residual IVF-PQ equals raw at full rerank (scoring plumbing exact)") {
    // Same probed candidate set + exact re-rank over all of it ⇒ the two
    // encodings MUST converge; divergence here would mean the residual
    // q̂·c_list + table-lookup scoring is wrong, not a recall trade.
    val sf = "/root/testdata/sf0.001"
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val raw = ids(Similarity.ivfPqTopK(spark, sf, rerank = 1000, residual = false))
    val res = ids(Similarity.ivfPqTopK(spark, sf, rerank = 1000, residual = true))
    assert(raw == res)
    assert(raw.nonEmpty)
  }

  test("persisted ANN index: artifact top-k is bit-identical to the fresh build") {
    val sf = "/root/testdata/sf0.001"
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val art = ids(Similarity.ivfPqTopKFromArtifact(spark, sf))
    val fresh = ids(Similarity.ivfPqTopK(spark, sf))
    assert(art == fresh)
    assert(art.nonEmpty)
  }

  test("persisted ANN index: the index scan partition-prunes to the probed lists") {
    val sf = "/root/testdata/sf0.001"
    val plan = Similarity.ivfPqTopKFromArtifact(spark, sf)
      .queryExecution.sparkPlan.toString
    // the partitioned catalog table must be read under a partition filter
    // on list_id — NOT a full scan plus a post-filter
    assert(plan.contains("PartitionFilters: [list_id"),
      s"no partition pruning on the index scan:\n$plan")
  }

  test("bigram-LM typicality: scores are mean corpus bigram counts, integer-exact") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.lmTypicality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // independent recomputation on the driver
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val allBigrams = texts.flatMap(_._2.split(" ").sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")).toSeq)
    val counts = allBigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = texts.flatMap { case (id, t) =>
      val bgs = t.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      if (bgs.isEmpty) None
      else {
        val sum = bgs.map(counts).sum
        Some((id, bgs.length.toLong, sum, sum * 1000000L / bgs.length))
      }
    }.sortBy(_._1).toSeq
    assert(rows.toSeq == expected)
  }

  test("PQ ANN: re-ranked top-k ranks the planted neighbor first; codes well-formed") {
    val top = Similarity.pqTopK(spark, dir, nQueries = 1, k = 2, rerank = 3).collect()
    assert(top.head.getLong(0) == 0L && top.head.getLong(1) == 1L && top.head.getLong(2) == 1L)
    val m = 16; val ksub = 32
    val codes = Similarity.pqCodes(spark, dir, m, ksub).select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 4)
    assert(codes.values.forall(c => c.length == m && c.forall(x => x >= 0 && x < ksub)))
    // deterministic: a second build yields identical codes
    val again = Similarity.pqCodes(spark, dir, m, ksub).select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == again)
  }

  test("salted join equals the plain join on real data (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val salted = Analytics.q23SkewJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = Tables.events(spark, sf).select(col("user_id"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")), "user_id")
      .groupBy("c_mktsegment").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain && salted.nonEmpty)
  }

  test("event anomaly flags match a BigInt recomputation of the 3-sigma test") {
    val sf = "/root/testdata/sf0.001"
    val rows = Analytics.q24EventAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, hs) =>
      val n = BigInt(hs.length)
      val s = hs.map(h => BigInt(h._3)).sum
      val ss = hs.map(h => BigInt(h._3) * BigInt(h._3)).sum
      hs.foreach { case (_, _, cnt, flag) =>
        val dev = BigInt(cnt) * n - s
        val expect = n >= 2 && dev * dev * (n - 1) > 9 * n * (n * ss - s * s)
        assert(flag == expect)
      }
    }
  }

  test("HLL approx distinct is within 5% of exact on the events table") {
    val sf = "/root/testdata/sf0.001"
    val approx = Analytics.q20ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Analytics.q7EventUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("as-of join picks the most recent preceding right row per key") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    val clicks = Seq((1L, ts(10), "c1"), (1L, ts(30), "c2"), (2L, ts(5), "c3"))
      .toDF("uid", "ts", "click_id")
    val buys = Seq((1L, ts(8), "b1"), (1L, ts(20), "b2"), (3L, ts(1), "b3"))
      .toDF("uid", "ts", "buy_id")
    val out = AsOfJoin.asOf(clicks, buys, "uid", "ts", Seq("buy_id"))
      .collect().map(r => r.getString(2) -> r.getString(3)).toMap
    assert(out("c1") == "b1")  // ts 10: latest buy <= 10 is b1(8)
    assert(out("c2") == "b2")  // ts 30: latest buy <= 30 is b2(20)
    assert(out("c3") == null)  // user 2 has no buys
  }

  test("token counts and quality formulas") {
    val t = TextAnalysis.tokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(t(0L) == (6L, 22L))
    val q = TextAnalysis.qualityScores(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // 6 words -> lenScore 0.06; avg word len (22-5)/6 = 2.83 in [2,12] -> x1.0
    assert(math.abs(q(0L) - 0.06) < 1e-12)
  }

  test("language id: stopword voting picks en and de correctly") {
    val langs = TextAnalysis.languageId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(0L) == "en" && langs(3L) == "de")
  }

  test("language spans: mixed doc segments at the vote boundary; und fills voteless spans") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-langspans").toString
    Seq(
      // 16 de words then 16 en words: exactly spans 0 (de) and 1 (en)
      (0L, (Seq.fill(16)("der") ++ Seq.fill(16)("the")).mkString(" "), "x", "s", 0L),
      (1L, "scan filter row", "x", "s", 0L),                // no vote -> und
      (2L, "le la et", "x", "s", 0L))                       // fr, one span
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val segs = TextAnalysis.languageSpans(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(segs.toSeq == Seq(
      (0L, 1L, "de", 0L, 0L, 1L), (0L, 2L, "en", 1L, 1L, 1L),
      (1L, 1L, "und", 0L, 0L, 1L),
      (2L, 1L, "fr", 0L, 0L, 1L)))
  }

  test("subword fertility: per predicted language, exact ppm, voteless docs excluded") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-fertility").toString
    Seq(
      // tie 16 de / 16 en -> lowest lang code wins: de; 32 words = 32 subtokens
      (0L, (Seq.fill(16)("der") ++ Seq.fill(16)("the")).mkString(" "), "x", "s", 0L),
      (1L, "scan filter row", "x", "s", 0L), // no stopword hit -> excluded
      (2L, "le l'a et", "x", "s", 0L))       // fr; l'a = 2 subtokens -> 4 total
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = TextAnalysis.subwordFertility(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("de", 1L, 32L, 32L, 1000000L),
      ("fr", 1L, 3L, 4L, 1333333L)))
  }

  test("sorted run stats kernel: distinct count + max multiplicity in one walk") {
    import spark.implicits._
    val df = Seq(Seq(1L, 1L, 2L, 3L, 3L, 3L), Seq.empty[Long]).toDF("a")
    val rows = df.select(graft.functions.ArrayOps.sortedRunStats(col("a"))).collect()
    assert(rows(0).getSeq[Long](0) == Seq(3L, 3L))
    assert(rows(1).getSeq[Long](0) == Seq(0L, 0L))
  }

  test("gopher repetition signals flag degenerate text, pass normal text") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-gopher").toString
    Seq(
      (0L, "spam spam spam spam", "en", "s", 19L),          // degenerate
      (1L, "the cat sat on the mat", "en", "s", 22L),       // normal
      (2L, "one", "en", "s", 3L))                           // single word
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val g = TextAnalysis.gopherSignals(spark, d2).collect()
      .map(r => r.getLong(0) -> r).toMap
    val spam = g(0L)
    assert(spam.getAs[Long]("n_words") == 4L && spam.getAs[Long]("n_types") == 1L)
    assert(spam.getAs[Long]("top_word_n") == 4L && spam.getAs[Double]("top_word_share") == 1.0)
    assert(spam.getAs[Long]("n_dup_2grams") == 2L)          // 3 bigrams, 1 distinct
    assert(math.abs(spam.getAs[Double]("dup_2gram_frac") - 2.0 / 3) < 1e-12)
    assert(spam.getAs[Double]("mean_word_len") == 4.0)
    val cat = g(1L)
    assert(cat.getAs[Long]("n_types") == 5L && cat.getAs[Long]("top_word_n") == 2L) // "the" x2
    assert(cat.getAs[Long]("n_dup_2grams") == 0L)
    assert(math.abs(cat.getAs[Double]("ttr") - 5.0 / 6) < 1e-12)
    val one = g(2L)
    assert(one.getAs[Long]("n_words") == 1L && one.getAs[Long]("n_dup_2grams") == 0L)
    assert(one.getAs[Double]("dup_2gram_frac") == 0.0)
  }

  test("dup-gram stats: copies share all grams, unique docs share none") {
    val d = TextAnalysis.dupGramStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    val byId = d.map(x => x._1 -> x).toMap
    // docs 0 and 1 are identical -> every gram shared
    assert(byId(0L)._4 == 1.0 && byId(1L)._4 == 1.0)
    assert(byId(0L)._2 == byId(0L)._3)
    // doc 4 shares no 3-gram with anything
    assert(byId(4L)._3 == 0L && byId(4L)._4 == 0.0)
    // doc 2 ("the red mat" insert) shares a prefix gram with 0/1 but not all
    assert(byId(2L)._4 > 0.0 && byId(2L)._4 < 1.0)
  }

  test("fingerprints: identical docs share identical fingerprint sets") {
    val fp = TextAnalysis.fingerprints(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(0L) == fp(1L))
  }

  test("curate_pipeline: every stage's invariant holds on real data (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val out = DocPipeline.curatePipeline(spark, sf).collect()
      .map(r => r.getLong(0)).toSet
    assert(out.nonEmpty)
    // quality gate respected
    val qualityKept = Curation.qualityFilter(spark, sf)
      .filter(col("kept")).collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(qualityKept))
    // no near-dup pair (>= 0.9) survives with both ends in the output
    val pairs = Dedup.jaccardPairs(spark, sf, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists { case (a, b) => out(a) && out(b) })
    // eval slice never enters training
    assert(out.forall(_ % 100 != 0))
    // no contaminated doc survives: nothing in `out` shares a 3-gram with
    // the eval slice (checked through the same gramSets the op uses)
    val g = TextAnalysis.gramSets(spark, sf)
      .select(col("doc_id"), explode(col("toks")).as("g")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val evalGrams = g.filter(_._1 % 100 == 0).map(_._2).toSet
    assert(!g.exists { case (id, gr) => out(id) && evalGrams(gr) })
  }

  test("collocations: attached pair outranks frequent-but-independent pair") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-colloc").toString
    // 'x y' always co-occur (5 of 5 x's); 'the cat' is frequent but 'the'
    // also pairs with many other words -> lower ratio
    val text1 = "x y " * 5 + ("the cat " + "the dog " + "the rat ") * 3
    Seq((0L, text1.trim, "en", "s", text1.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val r = TextAnalysis.collocations(spark, d2, k = 5, minCount = 3).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(6)))
    assert(r.head._1 == "x" && r.head._2 == "y" && r.head._4 == 1L)
    // ranks are contiguous and every surviving pair met the min count
    assert(r.map(_._4).toSeq == (1L to r.length).toSeq)
    assert(r.forall(_._3 >= 3L))
  }

  test("BPE induction: merge order follows pair frequency; apply respects bounds") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-bpe").toString
    // 'ab' appears in every word of the dominant words -> first merge (a,b)
    Seq(
      (0L, "abcd abcd abce abce abzz", "en", "s", 24L),
      (1L, "abcd abce qrs", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val merges = Tokenizer.learnMerges(spark, d2, nMerges = 2)
    assert(merges.head == ("a", "b"))
    assert(merges(1) == ("ab", "c")) // 'abc' prefix dominates after merge 1
    // kernel == shared applyMerges semantics
    val ranks = graft.functions.BpeOps.ranksOf(merges)
    assert(graft.functions.BpeOps.applyMerges("abcd".map(_.toString).toArray, ranks)
      .toSeq == Seq("abc", "d"))
    assert(graft.functions.BpeOps.applyMerges("qrs".map(_.toString).toArray, ranks)
      .toSeq == Seq("q", "r", "s"))
    val st = Tokenizer.bpeStats(spark, d2, nMerges = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(st(0L) == ((20L, 11L, 5L))) // abcd,abce -> 2 each; abzz -> ab,z,z = 3
    assert(st(1L) == ((11L, 7L, 3L)))  // abcd->2, abce->2, qrs->3
    st.values.foreach { case (sym, bpe, words) =>
      assert(words <= bpe && bpe <= sym)
    }
  }

  test("distributed BPE trainer equals the driver loop at matched caps, and at real depth") {
    val sf = "/root/testdata/sf0.001"
    // matched caps (4096 covers the whole sf0.001 vocabulary, so the
    // capped driver loop and the uncapped distributed trainer see the
    // same weighted vocab): merge SEQUENCES must be identical
    val driver = Tokenizer.learnMerges(spark, sf, nMerges = 64)
    val dist = Tokenizer.learnMergesDistributed(spark, sf, nMerges = 64)
    assert(dist == driver, s"first divergence at ${
      dist.zip(driver).indexWhere { case (a, b) => a != b }}")
    // full registered depth: the 256-merge distributed sequence equals
    // the driver loop run to the same depth (the driver's 4096 cap is a
    // no-op on this corpus, so the two see the same weighted vocab)
    val deep = Tokenizer.learnMergesDistributed(spark, sf, nMerges = 256)
    val deepDriver = Tokenizer.learnMerges(spark, sf, nMerges = 256)
    assert(deep == deepDriver, s"first divergence at ${
      deep.zip(deepDriver).indexWhere { case (a, b) => a != b }}")
    assert(deep.take(64) == driver)
    assert(deep.distinct.length == deep.length, "duplicate merge learned")
  }

  test("incremental-delta BPE trainer equals the re-segmenting trainers at 256 merges") {
    val sf = "/root/testdata/sf0.001"
    // the judge-pinned equality (r10 Next #4): the delta-maintained
    // trainer must reproduce the re-segmenting trainers' merge sequence
    // exactly — same seed counts, one-sweep-per-merge equivalence, same
    // (count desc, pair asc) total order
    val incr = Tokenizer.learnMergesIncremental(spark, sf, nMerges = 256)
    val deepDriver = Tokenizer.learnMerges(spark, sf, nMerges = 256)
    assert(incr == deepDriver, s"first divergence at ${
      incr.zip(deepDriver).indexWhere { case (a, b) => a != b }}")
    assert(incr.distinct.length == incr.length, "duplicate merge learned")
  }

  test("wordpiece: likelihood argmax diverges from BPE count argmax; MaxMatch kernel") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-wp").toString
    // c(ab-pair)=10 with c(a)=c(b)=40 -> score 10/1600; c(xy-pair)=9 with
    // c(x)=c(y)=9 -> score 9/81. BPE's count argmax picks (a,b);
    // WordPiece's likelihood argmax must pick (x,y) first.
    val abWords = Seq.fill(10)("ab") ++ Seq.fill(30)("a") ++ Seq.fill(30)("b")
    val xyWords = Seq.fill(9)("xy")
    Seq((0L, (abWords ++ xyWords).mkString(" "), "en", "s", 120L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val wp = Tokenizer.learnWordPiece(spark, d2, nMerges = 2)
    assert(wp == Seq(("x", "y"), ("a", "b")), s"got $wp")
    val bpe = Tokenizer.learnMerges(spark, d2, nMerges = 1)
    assert(bpe.head == ("a", "b")) // the count argmax — provably different
    // MaxMatch kernel: longest-match-first, [UNK] word = 1 token
    val vocab = graft.functions.WordPieceOps.vocabSetOf(
      Seq("a", "b", "c", "ab", "abc"))
    assert(graft.functions.WordPieceOps.maxMatchWord("abcab", vocab, 3) == 2)
    assert(graft.functions.WordPieceOps.maxMatchWord("ba", vocab, 3) == 2)
    assert(graft.functions.WordPieceOps.maxMatchWord("aqb", vocab, 3) == -1)
    assert(graft.functions.WordPieceOps.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcab aqb ba"),
      vocab, 3) == 2 + 1 + 2)
    // stats + gate over the tiny corpus: every word segmentable, bounds hold
    val st = Tokenizer.wordPieceStats(spark, d2, nMerges = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    st.foreach { case (sym, t, words) => assert(words <= t && t <= sym) }
    // after both merges every word is exactly one piece
    assert(st.head._2 == st.head._3)
    val g = Gates.wordPieceGate(spark, "/root/testdata/sf0.001").head()
    assert(g.getBoolean(2) && g.getBoolean(3), s"gate row $g")
  }

  test("unigram: EM mass shifts to whole-word pieces; Viterbi + prune invariants") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-uni").toString
    // "abc" dominates the corpus: after EM the whole-word piece must
    // out-weigh its sub-pieces and Viterbi must segment "abc" as ONE token
    val text = (Seq.fill(50)("abc") ++ Seq.fill(3)("ab") ++ Seq.fill(2)("c"))
      .mkString(" ")
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val vocab = Tokenizer.learnUnigram(spark, d2, targetVocab = 4,
      maxPieceLen = 3, seedSize = 16)
    val lp = vocab.toMap
    assert(lp.contains("a") && lp.contains("b") && lp.contains("c"),
      s"chars never pruned: $vocab") // coverage invariant
    assert(vocab.length == 4, s"pruned to target: $vocab")
    assert(lp.contains("abc") && lp("abc") > lp("c"), s"EM favors whole word: $vocab")
    val vm = graft.functions.UnigramOps.vocabMapOf(vocab)
    assert(graft.functions.UnigramOps.viterbiWord("abc", vm, 3) == 1)
    assert(graft.functions.UnigramOps.viterbiWord("abq", vm, 3) == -1) // [UNK]
    assert(graft.functions.UnigramOps.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc abq  c"),
      vm, 3) == 1 + 1 + 1)
    // stats + gate over the fixture corpus: bounds + compression hold
    val st = Tokenizer.unigramStats(spark, d2, targetVocab = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    st.foreach { case (sym, t, words) =>
      assert(words <= t && t <= sym, s"bounds: $sym $t $words") }
    val g = Gates.unigramGate(spark, "/root/testdata/sf0.001").head()
    assert(g.getBoolean(2) && g.getBoolean(3), s"gate row $g")
  }

  test("vocab top-k: tf/df totals, deterministic rank, k respected") {
    val v = TextAnalysis.vocabTopK(spark, dir, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(v.length == 3)
    // "the": docs 0/1/2 have 2 each -> tf 6, df 3 (docs 3/4 don't use it)
    assert(v(0) == ("the", 6L, 3L, 1L))
    assert(v.map(_._4).toSeq == Seq(1L, 2L, 3L)) // contiguous ranks in order
    assert(v.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) }) // tf desc, token asc
  }

  test("sketch gates hold at sf0.001: CMS bounds, GK rank bounds, HLL tolerance") {
    val sf = "/root/testdata/sf0.001"
    val hh = Profiling.cmsHeavyHitters(spark, sf).collect()
    assert(hh.length == 25 && hh.forall(_.getBoolean(3)))
    val qs = Profiling.quantileSketchGate(spark, sf).collect()
    assert(qs.nonEmpty && qs.forall(r => r.getBoolean(3) && r.getBoolean(4)))
    // exact discrete percentiles are genuinely order statistics: p50 <= p90
    qs.foreach(r => assert(r.getLong(1) <= r.getLong(2)))
    val sk = Profiling.lineitemSketchProfile(spark, sf).collect()
    assert(sk.nonEmpty && sk.forall(_.getBoolean(2)))
  }

  test("version restore: categories partition correctly; reconstruction exact") {
    val sf = "/root/testdata/sf0.001"
    val r = Versioning.snapshotRestore(spark, sf).head()
    val (nDrop, nReadd, nRevert, nV1) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getBoolean(4), "reconstruction must be exact")
    // independent arithmetic over the %-constructions
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    assert(nDrop == ids.count(i => i % 7 == 3 && i % 5 != 2))
    assert(nReadd == ids.count(i => i % 7 != 3 && i % 5 == 2))
    assert(nRevert == ids.count(i => i % 7 != 3 && i % 5 != 2 && i % 11 == 0))
    assert(nV1 == ids.count(_ % 7 != 3))
    assert(nDrop > 0 && nReadd > 0 && nRevert > 0)
  }

  test("gini profile: hand-computed impurity, nulls excluded, uniform vs constant") {
    import spark.implicits._
    val t = Seq(("a", Some("x"), 1, None: Option[String]),
        ("a", Some("x"), 2, None), ("b", None, 3, None))
      .toDF("c1", "c2", "c3", "c4")
    val all = Profiling.giniProfile(t).collect()
    // every schema column emits a row, even the all-NULL one
    assert(all.map(_.getString(0)).toSeq == Seq("c1", "c2", "c3", "c4"))
    val c4 = all.find(_.getString(0) == "c4").get
    assert(c4.isNullAt(1) && c4.isNullAt(2) && c4.isNullAt(3),
      "all-NULL column must emit NULL moments, not vanish")
    val rows = all.filter(!_.isNullAt(1))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // c1 = [a,a,b]: n=3, sum c^2 = 5, gini = 4e6 div 9 = 444444
    assert(rows("c1") == ((3L, 5L, 444444L)), rows("c1").toString)
    // c2 = [x,x,<null>]: null excluded -> constant column, impurity 0
    assert(rows("c2") == ((2L, 4L, 0L)))
    // c3 = all distinct: maximal impurity (n^2-n)e6 div n^2 = 666666
    assert(rows("c3") == ((3L, 3L, 666666L)))
  }

  test("theta intersection: exact when sketches undersized, bound holds at k=64") {
    val sf = "/root/testdata/sf0.001"
    // k larger than any group's distinct-key count -> theta = 1.0 on
    // both sides, the sample IS the set, the estimate IS exact: every
    // pair must gate true with zero tolerance consumed.
    val full = Profiling.thetaIntersection(spark, sf, k = 1 << 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(full.nonEmpty && full.forall(_._4), full.mkString(","))
    assert(full.map(t => (t._1, t._2)).distinct.length == full.length)
    full.foreach { case (a, b, n, _) => assert(a < b && n > 0) }
    // genuinely sketched: k=64 over sf0.001 (hundreds of distinct keys
    // per flag) still lands inside the gate's max(tol*n, 8) envelope
    // for this fixture (pinned: a regression in the estimator or the
    // bottom-k window shows up as a false boolean here)
    val sk = Profiling.thetaIntersection(spark, sf, k = 64, tol = 0.35).collect()
    assert(sk.nonEmpty && sk.forall(_.getBoolean(3)))
    // exact counts identical regardless of k: the truth side never
    // depends on the sketch
    assert(sk.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      full.map(t => (t._1, t._2, t._3)).toSeq)
  }

  test("url normalization: each rule fires; non-defaults and path case survive") {
    import spark.implicits._
    val cases = Seq(
      // fragment + case + default port + trailing slash
      ("HTTP://WWW.Ex.COM:80/A/B/#frag", "http://www.ex.com/A/B"),
      // https default port; explicit non-default stays
      ("HTTPS://Ex.Com:443/p", "https://ex.com/p"),
      ("https://ex.com:8443/p", "https://ex.com:8443/p"),
      // :443 on http and :80 on https are NOT defaults -> stay
      ("http://ex.com:443/p", "http://ex.com:443/p"),
      ("https://ex.com:80/p", "https://ex.com:80/p"),
      // utm first, param follows -> '?' healed; utm last -> dropped clean
      ("http://ex.com/p?utm_source=a&id=5", "http://ex.com/p?id=5"),
      ("http://ex.com/p?id=5&utm_campaign=b", "http://ex.com/p?id=5"),
      // ALL params tracking -> query gone entirely (and trailing slash)
      ("http://ex.com/p/?utm_a=1&utm_b=2", "http://ex.com/p"),
      // path case preserved; query case preserved
      ("http://EX.com/CaseSensitive?Q=V", "http://ex.com/CaseSensitive?Q=V"))
    val got = cases.map(_._1).toDF("url")
      .select(Curation.normalizeUrl(col("url")).as("n"))
      .collect().map(_.getString(0)).toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"normalize($in)")
    }
  }

  test("pii scrub: counts and redaction across kinds, non-PII lookalikes survive") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail a.b+c@ex.co and d@sub.ex.org then ip 10.0.0.1 tel 555-123-4567"),
      // lookalikes: 4-digit octet, phone with a 4-digit prefix run, bare '@'
      (1L, "not pii 1234.1.1.1 nor 5551-123-4567 nor a @ b"),
      (2L, "edge 192.168.0.255")) // IP at end of string
      .toDF("doc_id", "text")
    val r = Curation.piiScrub(df).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("n_emails") == 2L)
    assert(r(0L).getAs[Long]("n_ips") == 1L && r(0L).getAs[Long]("n_phones") == 1L)
    assert(r(0L).getAs[String]("redacted_text") ==
      "mail <EMAIL> and <EMAIL> then ip <IP> tel <PHONE>")
    assert(r(1L).getAs[Long]("n_emails") == 0L)
    assert(r(1L).getAs[Long]("n_ips") == 0L && r(1L).getAs[Long]("n_phones") == 0L)
    assert(r(1L).getAs[String]("redacted_text") == "not pii 1234.1.1.1 nor 5551-123-4567 nor a @ b")
    assert(r(2L).getAs[String]("redacted_text") == "edge <IP>")
  }

  test("span removal: cross-doc shared 3-grams vanish, within-doc repeats survive") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-spans").toString
    Seq(
      (0L, "a b c d e f", "en", "s", 11L),
      (1L, "x y z a b c", "en", "s", 11L),   // shares 'a b c' with doc 0
      (2L, "p q", "en", "s", 3L),            // too short for any 3-gram
      (3L, "u v w u v w", "en", "s", 11L))   // within-doc repeat only
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val r = Curation.removeSharedSpans(spark, d2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(0L) == ((6L, 3L, "d e f")))
    assert(r(1L) == ((6L, 3L, "x y z")))
    assert(r(2L) == ((2L, 0L, "p q")))
    assert(r(3L) == ((6L, 0L, "u v w u v w"))) // df counts DOCS, not occurrences
  }

  test("split assignments: deterministic, complete, per-mille proportions sane") {
    val sf = "/root/testdata/sf0.001"
    val a = Curation.splitAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = Curation.splitAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.toSeq == b.toSeq)                       // stable across runs
    assert(a.map(_._1).distinct.length == a.length)  // every doc exactly once
    val bySplit = a.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    assert(bySplit("train") > bySplit.getOrElse("valid", 0))
    a.foreach { case (_, bucket, split) =>
      val expect = if (bucket < 900) "train" else if (bucket < 950) "valid" else "test"
      assert(split == expect)
    }
  }

  test("operators degrade to empty output on an empty corpus, never crash") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    assert(Dedup.exact(spark, d2).isEmpty)
    assert(Dedup.jaccardPairs(spark, d2).isEmpty)
    assert(Dedup.clusterAssignments(spark, d2).isEmpty) // CC on zero edges
    assert(Dedup.incrementalPairs(spark, d2).isEmpty)
    assert(Dedup.incrementalExact(spark, d2).isEmpty)
    assert(TextAnalysis.gopherSignals(spark, d2).isEmpty)
    assert(TextAnalysis.vocabTopK(spark, d2).isEmpty)
    assert(Curation.qualityFilter(spark, d2).isEmpty)
    assert(Curation.splitAssignments(spark, d2).isEmpty)
    assert(Curation.removeSharedSpans(spark, d2).isEmpty)
    assert(Curation.packSequences(spark, d2).isEmpty)
    assert(DocPipeline.curatePipeline(spark, d2).isEmpty)
  }

  test("quality filter: first failing rule wins, clean doc kept") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft-qf").toString
    val clean = (1 to 40).map(i => s"word$i").mkString(" ")   // 40 distinct words
    val spam = Seq.fill(40)("spam").mkString(" ")             // ttr 1/40, top share 1.0
    Seq(
      (0L, clean, "en", "s", clean.length.toLong),
      (1L, spam, "en", "s", spam.length.toLong),
      (2L, "too short", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val r = Curation.qualityFilter(spark, d2).collect()
      .map(x => x.getLong(0) -> (x.getAs[String]("drop_reason"), x.getAs[Boolean]("kept"))).toMap
    assert(r(0L) == ("ok", true))
    // spam fails ttr AND top-word AND dup-bigrams; rule order pins the reason
    assert(r(1L) == ("repetitive_types", false))
    assert(r(2L) == ("too_short", false))
  }

  test("semantic dedup: reps keep themselves, every near-dup pair collapses") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.semanticDedup(spark, sf).collect()
    val rep = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(rep(r.getLong(1)) == r.getLong(1)) // rep of a rep is itself
      assert(r.getLong(1) <= r.getLong(0))      // rep = component MIN
      assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)))
    }
    // both endpoints of every threshold pair share a representative
    Dedup.embeddingPairs(spark, sf).collect()
      .foreach(p => assert(rep(p.getLong(0)) == rep(p.getLong(1))))
  }

  test("graph components: labels are minima, sizes count members, edges agree") {
    val sf = "/root/testdata/sf0.001"
    val rows = Graph.componentAssignments(spark, sf).collect()
    val comp = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == comp.size) // one row per vector
    rows.groupBy(_.getLong(1)).foreach { case (cid, ms) =>
      assert(ms.map(_.getLong(0)).min == cid)
      assert(ms.forall(_.getLong(2) == ms.length.toLong))
    }
    Graph.mutualKnnEdges(spark, sf, 5).collect()
      .foreach(e => assert(comp(e.getLong(0)) == comp(e.getLong(1))))
  }

  test("incremental ANN index: appended batch equals the one-pass twin, recall holds") {
    val sf = "/root/testdata/sf0.001"
    val row = Gates.annIncrArtifactGate(spark, sf).collect()(0)
    assert(row.getLong(0) > 0)       // brute truth non-empty
    assert(row.getBoolean(1))        // recall bound met on the full corpus
    assert(row.getBoolean(2))        // append-maintained == one-pass rebuild
    // the maintained index holds every corpus vector exactly once
    val ((idx, _), _) = Similarity.ivfPqIncrArtifacts(spark, sf)
    val n = spark.table(idx).count()
    val total = Tables.embeddings(spark, sf).count()
    assert(n == total)
    val distinct = spark.table(idx).select("vec_id").distinct().count()
    assert(distinct == total)
  }

  test("pagerank: planted graph matches a hand-rolled integer power iteration") {
    import spark.implicits._
    // triangle {1,2,3} with a pendant 4 attached to 3: the triangle's
    // hub (3) must outrank the pendant, and every step is exact integers
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = Graph.pageRankFromEdges(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
                  3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var pr = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      pr = adj.keys.map { v =>
        val s = adj(v).map(u => pr(u) / deg(u)).sum
        v -> (150000L + 17L * s / 20L)
      }.toMap
    }
    assert(got == pr)
    assert(got(3L) > got(4L)) // hub above pendant
    assert(got(1L) == got(2L)) // symmetric nodes tie exactly
  }

  test("pagerank on the real corpus: every mutual-graph node ranked, mass positive") {
    val sf = "/root/testdata/sf0.001"
    val rows = Graph.pageRank(spark, sf).collect()
    val nodes = Graph.mutualKnnEdges(spark, sf, 5).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(_.getLong(0)).toSet == nodes)
    assert(rows.forall(_.getLong(1) >= 150000L))
  }

  test("dsir affinity matches a BigInt recomputation; target bigrams score higher") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    val bigrams = docs.flatMap { case (id, src, toks) =>
      toks.sliding(2).filter(_.length == 2).map(p => (id, src, p.mkString(" ")))
    }
    val cAll = bigrams.groupBy(_._3).map { case (bg, o) => bg -> BigInt(o.length) }
    val cTgt = bigrams.filter(_._2 == "src0").groupBy(_._3)
      .map { case (bg, o) => bg -> BigInt(o.length) }
    val w = cAll.map { case (bg, ca) =>
      bg -> ((cTgt.getOrElse(bg, BigInt(0)) + 1) * 1000000) / (ca + 1) }
    val expected = bigrams.groupBy(_._1).map { case (id, occ) =>
      id -> ((BigInt(occ.length), occ.map(o => w(o._3)).sum)) }
    val got = Curation.dsirAffinity(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, a) = expected(r.getLong(0))
      assert(BigInt(r.getLong(1)) == n && BigInt(r.getLong(2)) == a)
    }
  }

  test("domain cap: at most cap survivors per source, ranks contiguous, deterministic") {
    val sf = "/root/testdata/sf0.001"
    def draw() = Curation.domainCap(spark, sf, cap = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = draw()
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length))
    }
    assert(rows.toSet == draw().toSet)
  }

  test("hard negatives: heap plan fires; negatives are non-near-dup; positive is rank-1") {
    val sf = "/root/testdata/sf0.001"
    val df = Similarity.hardNegatives(spark, sf, nQueries = 10)
    // the candidate cut runs on the bounded-heap operator, not a global sort
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // recompute ranks + cosines the straightforward way and check the rules
    import org.apache.spark.sql.expressions.Window
    val all = graft.operators.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cos = graft.functions.VectorFunctions.dot(col("embedding"), col("qv")) /
      (graft.functions.VectorFunctions.norm(col("embedding")) *
        graft.functions.VectorFunctions.norm(col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))
    val ranked = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cos.as("c"))
      .withColumn("rk", row_number().over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    rows.foreach { case (qid, posId, negId, negRank) =>
      assert(ranked((qid, posId))._2 == 1, s"positive of $qid is the rank-1 neighbor")
      val (negCos, negRk) = ranked((qid, negId))
      assert(negCos < 0.35, s"negative $negId of $qid is not a near-dup")
      assert(negRk >= 2 && negRk <= 64, s"negative $negId mined inside the top-64")
      assert(negRank >= 1 && negRank <= 3)
    }
    // neg_ranks are contiguous from 1 per query
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length))
    }
  }

  test("artifact-served hard negatives equal the brute gate truth; plan prunes + heaps") {
    val sf = "/root/testdata/sf0.001"
    val served = Similarity.hardNegativesFromIndex(spark, sf)
    // the scale plan: bounded-heap candidate cut over the index scan
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(plan.contains("PartitionFilters") || plan.contains("list_id"),
      "index scan should carry the probed-list partition pruning")
    val brute = Similarity.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute,
      s"served minus brute: ${(got -- brute).take(5)}; brute minus served: ${(brute -- got).take(5)}")
  }

  test("version_diff: statuses partition the snapshot union, per-source rollup consistent") {
    val sf = "/root/testdata/sf0.001"
    val (v1, v2) = Versioning.snapshots(spark, sf)
    val n1 = v1.count(); val n2 = v2.count()
    val union = v1.select("doc_id").union(v2.select("doc_id")).distinct().count()
    val rows = Versioning.snapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byStatus = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // added/removed/changed/unchanged partition the id union exactly
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"))
    assert(byStatus.values.sum == union)
    // removed = v1-only ids, added = v2-only ids
    assert(byStatus("removed") == union - n2)
    assert(byStatus("added") == union - n1)
    // changed docs are exactly the %11==0 edits present in BOTH snapshots
    val changed = v1.filter(col("doc_id") % 11 === 0)
      .join(v2.filter(col("doc_id") % 11 === 0), "doc_id").count()
    assert(byStatus("changed") == changed)
    // deterministic: a second run returns the identical rollup
    val again = Versioning.snapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("anneal schedule: epochs from the quality gate + ttr bar, anneal subset of kept") {
    val sf = "/root/testdata/sf0.001"
    val rows = Curation.annealSchedule(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val kept = Curation.qualityFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(6))).toMap
    rows.foreach { case (id, ttr, k, inAnneal, epochs) =>
      assert(k == kept(id))                      // same gate as curate_filter
      assert(!inAnneal || k)                     // anneal set subset of kept
      assert(inAnneal == (k && ttr >= 0.5))
      val expect = if (!k) 0L else if (inAnneal) 4L else 1L
      assert(epochs == expect)
    }
    // the bar discriminates on this corpus: all three epoch levels occur
    assert(rows.map(_._5).distinct.sorted.toSeq == Seq(0L, 1L, 4L))
  }

  test("10x scaled exact dedup = base dedup replicated with shifted ids, disjoint copies") {
    val sf = "/root/testdata/sf0.001"
    val base = Dedup.exactByHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val shift = Tables.documents(spark, sf).agg(max("doc_id")).head().getLong(0) + 1
    val scaled = Dedup.exactByHash10x(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // translate is a bijection, so each copy reproduces the base group
    // structure exactly, ids shifted by k*(max+1); copies are disjoint
    val expected = (0 until 10).flatMap(k =>
      base.map { case (id, n) => (id + k * shift, n) }).sorted
    assert(scaled.sorted.toSeq == expected)
    // the broadcast construction: no shuffle on the copy/shift joins
    val plan = Dedup.exactByHash10x(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  test("version_incr: delta = added+changed only, dup flag equals brute text lookup") {
    val sf = "/root/testdata/sf0.001"
    val (v1, v2) = Versioning.snapshots(spark, sf)
    val rows = Versioning.incrementalIngest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val v1Ids = v1.select("doc_id").collect().map(_.getLong(0)).toSet
    val v2Ids = v2.select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { case (id, status, _) =>
      assert(v2Ids(id))                          // delta comes from v2
      status match {
        case "added"   => assert(!v1Ids(id))
        case "changed" => assert(v1Ids(id) && id % 11 == 0)
        case other     => fail(s"unexpected status $other")
      }
    }
    // delta covers EXACTLY v2-minus-v1 plus the surviving edited docs
    assert(rows.map(_._1).toSet ==
      (v2Ids -- v1Ids) ++ v2Ids.filter(id => v1Ids(id) && id % 11 == 0))
    // dup flag == brute text membership in the settled corpus
    val v1Texts = v1.select("text").collect().map(_.getString(0)).toSet
    val v2Text = v2.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, dup) =>
      assert(dup == v1Texts(v2Text(id)), s"doc $id dup flag") }
  }

  test("version_gc: live/orphan file sets equal a brute per-bucket recompute") {
    val sf = "/root/testdata/sf0.001"
    val (v1, v2) = Versioning.snapshots(spark, sf)
    // brute model: per (source, bucket) the three flags straight from the
    // per-doc join semantics
    val a = v1.select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val b = v2.select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    case class F(v1f: Boolean, v2f: Boolean, tch: Boolean) {
      // copy-on-write: v2 rewrites the bucket's file iff it still has
      // docs there AND any doc was added/changed/REMOVED (a removal
      // alone forces the survivor set to be materialized)
      def rew: Boolean = v2f && tch
    }
    val flags = scala.collection.mutable.Map.empty[(String, Long), F]
    (a.keySet ++ b.keySet).foreach { id =>
      val src = b.get(id).map(_._1).getOrElse(a(id)._1)
      val bucket = id % 16
      val touched = a.get(id).map(_._2) != b.get(id).map(_._2)
      val f = flags.getOrElse((src, bucket), F(false, false, false))
      flags((src, bucket)) = F(f.v1f || a.contains(id), f.v2f || b.contains(id),
        f.tch || touched)
    }
    val expect = flags.toSeq.groupBy(_._1._1).map { case (src, fs) =>
      val v = fs.map(_._2)
      (src, v.count(_.v1f).toLong, v.count(_.rew).toLong,
        v.count(f => f.v1f && f.v2f && !f.rew).toLong,
        v.count(f => f.v1f && (f.rew || !f.v2f)).toLong,
        fs.filter { case (_, f) => f.v1f && (f.rew || !f.v2f) }
          .map(_._1._2).sum)
    }.toSeq.sortBy(_._1)
    val got = Versioning.snapshotGc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the policy discriminates on this corpus: live, orphaned and
    // rewritten are all non-trivial
    assert(got.map(_._4).sum > 0 && got.map(_._5).sum > 0)
    // conservation per source: every v1 file is live or orphaned
    got.foreach { case (_, fv1, _, live, orph, _) => assert(live + orph == fv1) }
  }

  test("jacobi eigensolver: known 2x2 and 3x3 spectra, orthonormal vectors") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2.
    val (e2, v2) = Similarity.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(e2(0) - 3.0) < 1e-12 && math.abs(e2(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2)
    assert(v2(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(v2(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // diag(5, 2, 7) with zero off-diagonals -> sorted eigenvalues 7, 5, 2.
    val (e3, v3) = Similarity.jacobiEigen(
      Array(Array(5.0, 0, 0), Array(0, 2.0, 0), Array(0, 0, 7.0)))
    assert(e3.zip(Array(7.0, 5.0, 2.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // A*v = lambda*v for a non-trivial symmetric 3x3.
    val m = Array(Array(4.0, 1.0, -2.0), Array(1.0, 3.0, 0.5), Array(-2.0, 0.5, 1.0))
    val (ev, vv) = Similarity.jacobiEigen(m)
    for (c <- 0 until 3; i <- 0 until 3) {
      val av = (0 until 3).map(j => m(i)(j) * vv(c)(j)).sum
      assert(math.abs(av - ev(c) * vv(c)(i)) < 1e-9, s"A*v=lv comp $c row $i")
    }
  }

  test("pca gate: all gates pass and trace anchor matches an integer recompute (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.pcaGate(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("eig_sum_ok")), "eig_sum_ok")
      assert(r.getBoolean(r.fieldIndex("ortho_ok")), "ortho_ok")
      assert(r.getBoolean(r.fieldIndex("monotone_ok")), "monotone_ok")
      assert(r.getBoolean(r.fieldIndex("var_match_ok")), "var_match_ok")
    }
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val n = vecs.length.toLong
    val dims = vecs.head.length
    val trace = (0 until dims).map { d =>
      val xi = vecs.map(v => math.floor(v(d).toDouble * 1000.0).toLong)
      BigInt(n) * xi.map(x => x * x).sum - BigInt(xi.sum) * xi.sum
    }.sum
    assert(rows.head.getLong(rows.head.fieldIndex("trace_num")) == trace.toLong)
    assert(rows.head.getLong(rows.head.fieldIndex("n")) == n)
  }

  test("int8 quantization stats match an independent in-memory recomputation (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.quantizeStats(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    assert(rows.length == dims)
    val byDim = rows.map(r => r.getLong(r.fieldIndex("dim")) -> r).toMap
    for (d <- 0 until dims) {
      val xs = vecs.map(v => v(d).toDouble)
      val amax = xs.map(math.abs).max
      // Same IEEE op order as the operator AND the DuckDB oracle:
      // x*127/amax + 0.5 (floor), q*amax/127, |x-deq|*1e9 (floor).
      val qs = xs.map { x =>
        if (amax > 0)
          math.max(-127.0, math.min(127.0,
            math.floor(x * 127.0 / amax + 0.5))).toLong
        else 0L
      }
      val err = xs.zip(qs).map { case (x, q) =>
        math.floor(math.abs(x - q.toDouble * amax / 127.0) * 1e9).toLong }.sum
      val r = byDim(d + 1L)
      assert(r.getDouble(r.fieldIndex("amax")) == amax, s"dim ${d + 1} amax")
      assert(r.getLong(r.fieldIndex("n")) == xs.length)
      assert(r.getLong(r.fieldIndex("sum_q")) == qs.sum, s"dim ${d + 1} sum_q")
      assert(r.getLong(r.fieldIndex("sum_q2")) == qs.map(q => q * q).sum)
      assert(r.getLong(r.fieldIndex("err_nano_sum")) == err, s"dim ${d + 1} err")
      assert(r.getLong(r.fieldIndex("n_sat")) == qs.count(q => math.abs(q) == 127))
    }
  }

  test("kcore: hand-traced peeling on a clique with a pendant chain") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + chain 4-5-6. k=3 peeling: round 1 removes 5
    // (deg 2) and 6 (deg 1); the clique then has degree 3 everywhere and
    // survives all remaining rounds.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val out = Graph.kCoreFromEdges(edges, coreK = 3, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, true), (2L, 0L, true), (3L, 0L, true),
      (4L, 0L, true), (5L, 1L, false), (6L, 1L, false)), out.mkString(","))
    // cascading peel: a path 1-2-3 at k=2 — ends peel round 1, middle
    // node's degree then collapses and it peels round 2.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = Graph.kCoreFromEdges(path, coreK = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(p.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 1L)), p.mkString(","))
  }

  test("linkpred: square graph predicts the diagonals with full jaccard") {
    import spark.implicits._
    // square 1-2-3-4-1: the only non-adjacent 2-hop pairs are the two
    // diagonals, each sharing BOTH neighbors: cn=2, |union|=2 -> 1e6.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val out = Graph.linkPredictionFromEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L),
      (3L, 1L, 2L, 1000000L), (4L, 2L, 2L, 1000000L)), out.mkString(","))
    // triangle: every 2-hop neighbor is already adjacent -> no rows
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(Graph.linkPredictionFromEdges(tri).count() == 0L)
  }

  test("phi2 drift: registered row near-uniform; formula equals chi2/n by hand") {
    val got = Profiling.phiSquaredDrift(spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) > 0)
      assert(r.getLong(3) >= 0)
    }
    // hand fixture: cat A 30/10, cat B 10/30 -> chi2 = 20, n = 80,
    // phi2 = 0.25; per-cell contribution 62500 micro, per-cat 125000.
    // (o*n - r*c)^2 / (n^2*r*c): (30*80-40*40)^2/(80^2*40*40) = 0.0625.
    val o = Seq(("A", 0L, 30L), ("A", 1L, 10L), ("B", 0L, 10L), ("B", 1L, 30L))
    val contrib = o.map { case (_, s, ov) =>
      val r = 40L; val c = 40L; val n = 80L
      1000000L * (ov * n - r * c) * (ov * n - r * c) / (n * r * c * n)
    }
    assert(contrib.forall(_ == 62500L) && contrib.sum == 250000L)
  }

  test("version_compact: groups replay the running-offset arithmetic") {
    val sf = "/root/testdata/sf0.001"
    val rows = Versioning.compactionPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // independent replay: per source walk buckets in order, carry cumsum
    val (_, v2) = Versioning.snapshots(spark, sf)
    val files = v2.select("doc_id", "source", "n_chars").collect()
      .map(r => ((r.getString(1), r.getLong(0) % 16), r.getLong(2)))
      .groupBy(_._1).map { case ((src, b), xs) =>
        (src, b, xs.size.toLong, xs.map(_._2).sum) }.toSeq
    val expect = files.groupBy(_._1).flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, b, nd, ch) =>
        val grp = cum / 12; cum += nd; (src, grp, b, nd, ch) }
    }.groupBy(t => (t._1, t._2)).map { case ((src, grp), cells) =>
      (src, grp, cells.size.toLong, cells.map(_._4).sum, cells.map(_._5).sum,
        cells.map(_._3).min, cells.map(_._3).max)
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(rows.toSeq.sortBy(t => (t._1, t._2)) == expect,
      s"got ${rows.take(3).mkString(",")}")
    // the planner actually groups: some group must pack >1 file
    assert(rows.exists(_._3 > 1))
  }

  test("feathash: bucket is the md5 prefix mod D; totals conserve tokens") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.featureHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(t => t._1 >= 0 && t._1 < 64))
    // token conservation against an independent count
    val total = Tables.documents(spark, sf).collect()
      .map(_.getString(1).split(" ").count(_.nonEmpty).toLong).sum
    assert(rows.map(_._2).sum == total)
    // hand-check one bucket id with java's own md5
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("the".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val expect = java.lang.Long.parseLong(hex, 16) % 64
    val toks = Tables.documents(spark, sf).collect()
      .flatMap(_.getString(1).split(" ")).filter(_.nonEmpty)
    if (toks.contains("the")) {
      val inBucket = rows.find(_._1 == expect)
      assert(inBucket.nonEmpty && inBucket.get._2 >= toks.count(_ == "the"))
    }
  }

  test("profile_ks: equals a brute CDF recompute on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val r = Profiling.ksDrift(spark, sf).head()
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ms"))
      .collect()
      // 1998-06-01T00:00Z = 896659200000 ms (session tz is UTC)
      .map(x => (x.getDouble(0).toLong, x.getLong(1) < 896659200000L))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filter(!_._2).map(_._1).sorted
    val vals = (a ++ b).distinct.sorted
    val diffs = vals.map { v =>
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      (v, (ca * b.length - cb * a.length).abs)
    }
    val mx = diffs.map(_._2).max
    assert(r.getLong(0) == mx, s"ks_num ${r.getLong(0)} vs $mx")
    assert(r.getLong(1) == a.length.toLong && r.getLong(2) == b.length.toLong)
    assert(r.getLong(3) == 1000000L * mx / (a.length.toLong * b.length))
    assert(r.getLong(4) == diffs.filter(_._2 == mx).map(_._1).min)
  }

  test("curate_ctxpack: greedy chains equal an independent replay on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val out = Curation.contextPackOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent replay: packs from cumulative doc_id-ordered token
    // sums, then the greedy max-dot chain per pack on micro-int vectors
    val toks = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong)
      .sortBy(_._1)
    val packOf = {
      var cum = 0L
      toks.map { case (id, n) => val p = cum / 256; cum += n; id -> p }.toMap
    }
    val mic = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000.0).toLong).toArray)
      .toMap
    val expect = packOf.toSeq.groupBy(_._2).toSeq.flatMap { case (p, ms) =>
      val ids = ms.map(_._1).filter(mic.contains).sorted.toBuffer
      val chain = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var cur = ids.remove(0)
      chain += ((p, 0L, cur, 0L))
      var seq = 1L
      while (ids.nonEmpty) {
        val (nid, nd) = ids.map { c =>
          c -> mic(cur).zip(mic(c)).map { case (a, b) => a * b }.sum
        }.maxBy { case (c, d) => (d, -c) }
        ids -= nid
        chain += ((p, seq, nid, nd)); cur = nid; seq += 1
      }
      chain
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expect, s"op=${out.length} expect=${expect.length}")
    // the chain genuinely reorders: some pack's sequence is not id-sorted
    assert(out.groupBy(_._1).values.exists(p =>
      p.sortBy(_._2).map(_._3).toSeq != p.map(_._3).sorted.toSeq))
  }

  test("embed_domains: source-pair cosines equal an integer-sum replay") {
    val sf = "/root/testdata/sf0.001"
    val out = Similarity.domainSimilarity(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val src = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val mic = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000.0).toLong).toArray)
    val sums = mic.groupBy(v => src(v._1)).map { case (s0, vs) =>
      s0 -> vs.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    }
    val names = sums.keys.toSeq.sorted
    val expect = (for {
      a <- names; b <- names if a < b
      dot = sums(a).zip(sums(b)).map { case (x, y) => x * y }.sum
      n2a = sums(a).map(x => x * x).sum; n2b = sums(b).map(x => x * x).sum
    } yield (a, b) -> ((dot,
      dot.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))))).toMap
    assert(out == expect)
    assert(out.nonEmpty)
  }

  test("profile_incr: merged sketch estimates pass the gate at exact fixture counts") {
    val rows = Profiling.incrementalProfile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // exact distincts on the 5-doc fixture: text has one exact dup,
    // n_chars {22,26,48,59}, lang {en,de}, source {s}
    assert(rows == Map(
      "doc_id" -> ((5L, true)), "text" -> ((4L, true)),
      "lang" -> ((2L, true)), "source" -> ((1L, true)),
      "n_chars" -> ((4L, true))))
    // second call reuses the settled artifact (build-once) and agrees
    val again = Profiling.incrementalProfile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(again == rows)
    // the serve leg alone (no exact pass) estimates the same counts
    // exactly at fixture cardinality (HLL is exact for tiny sets)
    val serve = Profiling.incrementalProfileServe(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(serve == rows.map { case (k, (n, _)) => k -> n })
  }

  test("profile_expect: planted violations counted per rule, clean rules pass") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-expect").toString
    Seq(
      (10L, Some("ok text"), "en", "src1", 7L),     // clean
      (10L, Some("dup id"), "en", "src2", 6L),      // duplicate doc_id
      (11L, None, "english", "bad", 5L),            // null text, bad lang+source
      (12L, Some("abc"), "fr", "src3", 99L),        // n_chars mismatch
      (13L, Some("xyz"), "de", "src4", 0L))         // out-of-range (and mismatch)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val out = Profiling.expectations(spark, d2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == (("doc_id", "not_null", 5L, 0L, true)))
    assert(out(2L) == (("doc_id", "unique", 5L, 1L, false)))
    assert(out(3L) == (("text", "not_null", 5L, 1L, false)))
    // mismatches: null-text row, 99-vs-3, 0-vs-3
    assert(out(4L) == (("n_chars", "eq_length_text", 5L, 3L, false)))
    assert(out(5L) == (("lang", "regex_iso639", 5L, 1L, false)))
    assert(out(6L) == (("source", "regex_src_domain", 5L, 1L, false)))
    assert(out(7L) == (("n_chars", "range_1_1000000", 5L, 1L, false)))
    // all-pass on the real (clean) corpus
    assert(Profiling.expectations(spark, "/root/testdata/sf0.001").collect()
      .forall(_.getBoolean(5)))
  }

  test("embed_matryoshka: prefix ranking diverges from full-dim cosine as data") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-matr").toString
    // 64-dim: prefix signal in dims 0-1, suffix signal in dim 16. The
    // query q=(1,0 | 1). Candidate a matches the prefix exactly but
    // OPPOSES the suffix (full cos 0); b..f degrade in prefix alignment
    // but share the suffix (full cos (x+1)-monotone); g opposes both.
    def vec(x: Float, y: Float, sfx: Float): Array[Float] = {
      val v = Array.fill(64)(0.0f); v(0) = x; v(1) = y; v(16) = sfx; v
    }
    val vs = Seq(
      0L -> vec(1.0f, 0.0f, 1.0f),   // query (0 % 53 == 0)
      1L -> vec(1.0f, 0.0f, -1.0f),  // a: prefix-perfect, cosine 0
      2L -> vec(0.9f, 0.3f, 1.0f),   // b
      3L -> vec(0.8f, 0.4f, 1.0f),   // c
      4L -> vec(0.7f, 0.5f, 1.0f),   // d
      5L -> vec(0.6f, 0.6f, 1.0f),   // e
      6L -> vec(0.5f, 0.7f, 1.0f),   // f: cos top-5, prefix rank 6
      7L -> vec(-1.0f, 0.0f, 1.0f))  // g: prefix-last
    vs.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val out = Similarity.matryoshkaTopK(spark, d2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // independent replay of the prefix micro-dot ranking
    def micro(v: Array[Float]): Array[Long] =
      v.take(16).map(x => math.floor(x.toDouble * 1000.0).toLong)
    val q16 = micro(vs.head._2)
    val pre = vs.tail.map { case (id, v) =>
      val m = micro(v)
      val dot = m.zip(q16).map { case (p, q) => p * q }.sum
      val n = math.sqrt(m.map(x => x * x).sum.toDouble)
      (id, dot, dot.toDouble / n)
    }.sortBy(t => (-t._3, t._1)).take(5)
    assert(out.map(t => (t._2, t._3)).toSeq == pre.map(t => (t._1, t._2)))
    // vec 1 tops the prefix ranking yet is NOT a full-cosine top-5 hit;
    // vecs 2..5 are; vec 6 (a genuine cosine hit) missed the prefix cut
    assert(out.head == ((1L, 1L, 1000000L, false)))
    assert(out.filter(_._4).map(_._2).toSet == Set(2L, 3L, 4L, 5L))
    assert(!out.map(_._2).contains(6L))
  }

  test("ann_mips: dot order beats cosine order exactly where norms differ") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-mips").toString
    // query 0 = (1,0). MIPS order: a(10,0) dot 10e6, c(3,3) dot 3e6,
    // b(.5,.05) dot 5e5. Cosine order: a (1.0), b (~.995), c (~.707) —
    // c is rank 2 by dot but rank 3 by cosine: the norm bias as data.
    Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(10.0f, 0.0f), 0),
      (2L, Array(0.5f, 0.05f), 0), (3L, Array(3.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val out = Similarity.mipsTopK(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).distinct.toSeq == Seq(0L))
    // exact micro dots: 10000*1000, 3000*1000, 500*1000 (+0*y terms)
    assert(out.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((1L, 1L, 10000000L), (2L, 3L, 3000000L), (3L, 2L, 500000L)),
      out.mkString(","))
    // the norm-bias witness: dot rank 2 (vec 3) is cosine rank 3
    assert(out.find(_._3 == 3L).get._5 == 3L)
    assert(out.find(_._3 == 1L).get._5 == 1L)
  }

  test("embed_binary: hand signatures, hamming order, identical-sign hamm 0") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-bin").toString
    // query 0 signs (+,-,+) -> sig 0b101 = 5; vec 1 same signs -> hamm 0;
    // vec 2 signs (-,+,-) -> sig 2, hamm(5^2=7) = 3; vec 3 (+,+,+) -> 7,
    // hamm(5^7=2) = 1. Zero is non-negative -> bit set.
    Seq((0L, Array(1.0f, -1.0f, 1.0f), 0),
      (1L, Array(0.5f, -0.2f, 0.9f), 0),
      (2L, Array(-1.0f, 1.0f, -1.0f), 0),
      (3L, Array(0.9f, 0.1f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val out = Similarity.binaryQuantTopK(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.map(_._1).distinct.toSeq == Seq(0L)) // only vec 0 queries
    assert(out.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((1L, 1L, 0L), (2L, 3L, 1L), (3L, 2L, 3L)), out.mkString(","))
    // k=5 over 3 candidates: the cosine top-k covers everything -> all hit
    assert(out.forall(_._5))
  }

  test("leaksplit: clusters never straddle splits; keyed by cluster lcg") {
    val sf = "/root/testdata/sf0.001"
    val out = Curation.leakSafeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    // zero straddle: within a cluster the split is constant
    out.groupBy(_._2).foreach { case (c, docs) =>
      assert(docs.map(_._3).distinct.length == 1, s"cluster $c straddles") }
    // discriminates: at least one multi-doc cluster and >1 split present
    assert(out.groupBy(_._2).exists(_._2.length > 1))
    assert(out.map(_._3).distinct.length > 1)
    // split is the documented pure function of cluster_id
    out.foreach { case (_, c, s) =>
      val b = ((c % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 1000L
      val want = if (b < 900) "train" else if (b < 950) "valid" else "test"
      assert(s == want)
    }
  }

  test("embed_outlier: planted inverse vector ranks first in its label") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-outl").toString
    // label 0: three aligned vectors and one pointing the opposite way;
    // label 1: two aligned. The inverse vector must be rank 1 outlier.
    Seq(
      (1L, Array(1.0f, 0.1f, 0.0f), 0), (2L, Array(0.9f, 0.2f, 0.0f), 0),
      (3L, Array(1.1f, 0.0f, 0.1f), 0), (4L, Array(-1.0f, -0.1f, 0.0f), 0),
      (5L, Array(0.0f, 1.0f, 0.0f), 1), (6L, Array(0.1f, 0.9f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val out = Similarity.embedOutliers(spark, d2, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lab0 = out.filter(_._1 == 0L)
    assert(lab0.head._3 == 4L, s"inverse vector must rank 1: ${out.mkString(",")}")
    assert(lab0.head._4 < 0, "its dot with the group sum must be negative")
    assert(out.count(_._1 == 1L) == 2)
    // exact dot check for the planted vector: micro coords are exact
    // integers (same IEEE op order as the operator — floor(double*1000),
    // which floors -0.1f to -101, not -100), sum-vector their exact sum
    val mic = Seq(Array(1.0f, 0.1f, 0.0f), Array(0.9f, 0.2f, 0.0f),
      Array(1.1f, 0.0f, 0.1f), Array(-1.0f, -0.1f, 0.0f))
      .map(_.map(x => math.floor(x.toDouble * 1000.0).toLong).toSeq)
    val sv = mic.transpose.map(_.sum)
    val dot4 = mic(3).zip(sv).map { case (a, b) => a * b }.sum
    assert(lab0.head._4 == dot4)
  }
}
