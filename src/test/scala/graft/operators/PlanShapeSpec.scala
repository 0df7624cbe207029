package graft.operators

import graft.SparkSpec

/** Plan-REGRESSION pins: each test asserts the physical-plan property a
  * scaladoc's scale claim rests on, so an innocent refactor that
  * silently reintroduces an exchange / Expand / full rebuild fails here
  * instead of surfacing as a bench regression three rounds later. */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("search_incr_artifact: settled side is a bucketed scan with no exchange above it") {
    val plan = planOf(Search.incrementalIndex(spark, sf))
    // the settled table scan appears...
    assert(plan.contains("graft_search_idx_"), plan)
    // ...and the only exchanges are the increment build + presentation
    // sort: settled rows never re-shuffle. The full-outer join keyed on
    // term shows 2 exchanges total (incr side + final orderBy).
    val exchanges = "Exchange hashpartitioning|Exchange rangepartitioning".r
      .findAllIn(plan).size
    assert(exchanges <= 3, s"unexpected exchange count $exchanges in:\n$plan")
    // no exchange may sit between the bucketed scan and the join: the
    // scan's subtree up to SortMergeJoin must be exchange-free
    val scanIdx = plan.indexOf("Scan parquet spark_catalog.default.graft_search_idx_")
    val joinIdx = plan.lastIndexOf("SortMergeJoin", scanIdx)
    assert(joinIdx >= 0, plan)
    val between = plan.substring(joinIdx, scanIdx)
    // the settled leg is the FIRST child: between the join node and the
    // scan only Sort may appear
    assert(!between.split("\n").exists(_.contains("Exchange")),
      s"exchange above the settled scan:\n$plan")
  }

  test("profile_columns: no Expand; distinct rides the two-phase rewrite") {
    val plan = planOf(Profiling.columnProfile(Tables.lineitem(spark, sf)))
    assert(!plan.contains("Expand"), plan)
    assert(plan.contains("Generate"), plan) // the melt
  }

  test("text_readability: higher-order lambdas, no Generate, single data exchange") {
    val plan = planOf(TextAnalysis.readability(spark, sf))
    // the scaladoc claim: no explode anywhere — syllable counting runs
    // inside array lambdas, so the plan has zero Generate nodes
    assert(!plan.contains("Generate"), plan)
    // and the only exchange is the presentation sort
    val ex = "Exchange ".r.findAllIn(plan).size
    assert(ex <= 1, s"expected only the presentation sort, got $ex:\n$plan")
  }

  test("events_paths: both leads share ONE user_id sort; rank window is post-limit") {
    val plan = planOf(EventAnalytics.topPaths(spark, sf))
    // two stacked leads must not cost two user-keyed exchanges
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userEx == 1, s"expected one user_id exchange, got $userEx:\n$plan")
    // the top-k is TakeOrdered, not a global sort of all triples
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("curate_tokenbudget: no unpartitioned row-scale window; offsets on the score domain") {
    val plan = planOf(Curation.tokenBudgetSelect(spark, sf))
    // the in-bucket cumsum is PARTITIONED (keyed window); the only
    // single-partition window runs over the aggregated score domain —
    // its input must be the bucket aggregate, never the doc relation
    val singleIdx = plan.indexOf("Exchange SinglePartition")
    assert(singleIdx >= 0, plan)
    val below = plan.substring(singleIdx)
    assert(below.contains("HashAggregate"),
      s"single-partition window must sit above the score aggregate:\n$plan")
  }

  test("dedup_incr_bloom: bloom probe inside the plan, corpus side bucketed") {
    val plan = planOf(Dedup.incrementalExactBloom(spark, sf))
    assert(plan.contains("graft_settled_th_"), plan)
    assert(plan.toLowerCase.contains("bloommightcontain"), plan)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("export_training: one declarative plan, no barrier, final exchange keyed on shard") {
    val df = DocPipeline.exportTraining(spark, sf)
    val plan = planOf(df)
    // materializations are TWO-BRANCH REUSES only (see the operator's
    // scaladoc): the near-dup prefix relation (`ptok` column — both
    // sides of the pair self-join) and the mixed survivor set (`rk` +
    // `n_tokens` — the pack stage's block-total aggregate and row-local
    // prefix window). Anything else is a stage hand-off and fails here.
    assert(!plan.contains("InMemoryTableScan"), plan.take(3000))
    val rddLeaves = plan.linesIterator.filter(_.contains("ExistingRDD")).toSeq
    assert(rddLeaves.forall(l => l.contains("ptok") ||
        (l.contains("rk") && l.contains("n_tokens"))),
      s"stage-boundary materialization in the capstone chain:\n${rddLeaves.mkString("\n")}")
    // and the curation chain executes ONCE: the exact-dedup
    // hash-groupBy exchange (text-hash key `th`) appears at most once —
    // zero when the chain ran inside the mixed checkpoint's own
    // execution, one if a refactor inlines it; twice means the chain
    // was re-executed for the pack stage's second branch (the audit's
    // original finding)
    assert(plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(th#")) <= 1,
      "curation chain re-executed — dedup exchange appears more than once")
    // the FINAL exchange (topmost hashpartitioning in the root-first
    // tree print, under the presentation range sort) is keyed on shard
    // alone — the write-side partitioning a shard writer consumes
    val firstHash = plan.linesIterator
      .find(_.contains("Exchange hashpartitioning"))
      .getOrElse(fail("no hash exchange in plan"))
    assert(firstHash.contains("shard"), s"final exchange not shard-keyed: $firstHash")
    assert(!firstHash.contains("doc_id") && !firstHash.contains("source"),
      s"final exchange carries more than the shard key: $firstHash")
  }

  test("dedup_contain: keyed prefix-postings join, no cartesian, no dedup shuffle") {
    val plan = planOf(Dedup.containmentPairsUnsorted(spark, sf, 0.95))
    // the candidate join is an equi-join on the shared token — never a
    // cartesian / broadcast-nested-loop over the corpus
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // firstShared single-retention means NO distinct/dropDuplicates
    // exchange over the (much larger) raw candidate stream
    assert(!plan.contains("HashAggregate(keys=[doc_small"), plan)
    // exactly one merge-walk intersect per surviving candidate: the
    // codegen expression appears in the plan, not array_intersect
    assert(plan.contains("sortedintersectcount") ||
      plan.contains("SortedIntersectCount"), plan)
    assert(!plan.contains("array_intersect"), plan)
  }

  test("embed_domains: corpus scanned once into a keyed aggregate; pair join is broadcast") {
    val plan = planOf(Similarity.domainSimilarity(spark, sf))
    // the all-pairs stage joins the tiny source dimension — broadcast,
    // never a shuffled join of row-scale data
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_rfm: range-partitioned ranks — no single-partition exchange anywhere") {
    // checkpoint = false keeps the FULL lineage visible (localCheckpoint
    // truncates the plan to Scan ExistingRDD — the memory-noted pitfall),
    // so this asserts the real shape of the rank computation: the r12
    // spelling's three unpartitioned row_number windows each planned
    // Exchange SinglePartition over the whole user dimension (VERDICT
    // r12 What's-wrong #1); the rangedRank respelling must never.
    // Inspected WITHOUT planOf's noop write: the plan-only relation is
    // execution-poisoned (see below), so this reads the initial
    // physical plan — exchanges/windows are planned before AQE
    // finalization, which is all these pins assert.
    val plan = EventAnalytics.rfmScoresImpl(spark, sf, checkpoint = false)
      .queryExecution.executedPlan.toString
    // no Window operator survives at all — ranks come from the stamped
    // monotonically_increasing_id + broadcast offsets, not WindowExec
    assert(!plan.contains("Window"), s"WindowExec reintroduced:\n$plan")
    // the ranks really are range exchanges (one per metric, plus the
    // presentation sort)
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(plan).size
    assert(rangeEx >= 3, s"expected >=3 range exchanges, got $rangeEx:\n$plan")
    // the ONLY single-partition exchanges are the 1-row corpus totals
    // (max_ms, n_users) — a keyless aggregate whose final step is
    // 32 partial rows into one task, bounded at any corpus size. Each
    // occurrence must sit directly above a keyless HashAggregate; a
    // data-scale single-partition exchange (the r12 windows) fails here.
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(i + 1 < lines.length &&
          lines(i + 1).contains("HashAggregate(keys=[]"),
          s"data-scale single-partition exchange at line $i:\n$plan")
      }
    // the hazard is structural (ADVICE r13): the plan-only relation
    // cannot be executed into wrong ranks — its poison assertion fires
    // on the first produced row
    val ex = intercept[Exception] {
      EventAnalytics.rfmScoresImpl(spark, sf, checkpoint = false)
        .limit(1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("plan inspection")), ex.toString)
  }

  test("ts_downsample: one keyed aggregate with map-side combine, no window sorts") {
    val plan = planOf(EventAnalytics.downsampleOhlc(spark, sf))
    // the r12 spelling paid two per-bucket row_number sorts AND shuffled
    // every event row (windows need full rows — ADVICE r12); min_by/
    // max_by fold open/close into the one aggregate: no WindowExec, a
    // PARTIAL aggregate below the exchange (map-side combine — the
    // exchange carries one row per (key, input partition), not per
    // event), and every surviving Sort orders by the GROUPING KEYS only
    // (SortAggregate's local key sort + the presentation orderBy), never
    // by (ts, event_id)
    assert(!plan.contains("Window"), s"window rank respelling returned:\n$plan")
    assert(plan.contains("partial_min_by"), s"map-side combine missing:\n$plan")
    plan.linesIterator.filter(_.contains("Sort [")).foreach { l =>
      assert(!l.contains("ts#") && !l.contains("event_id#"),
        s"row-scale (ts, event_id) sort reintroduced: $l")
    }
  }

  test("graph family: serving queries scan the edge artifact, no IVF rebuild") {
    val plan = planOf(Graph.triangleCounts(spark, sf))
    assert(plan.contains("graft_knn_edges_") || plan.contains("graft_"),
      plan.take(2000))
    // an IVF rebuild would show the centroid dot-product projection over
    // the embeddings scan; the serving path must not read embeddings
    assert(!plan.contains("embeddings.parquet"), plan.take(4000))
  }

  test("text_langspans: wordlist join broadcasts; every window partitions by doc") {
    val plan = planOf(TextAnalysis.languageSpans(spark, sf))
    // the constant-size wordlist must ride a broadcast join, never a
    // shuffled one — the token explode is the only data-scale relation
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // both the per-span vote window and the islands window partition by
    // doc_id: a single-partition window here would serialize the corpus
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in langspans:\n$plan")
  }

  test("text_fertility: languages-sized aggregate with map-side combine") {
    val plan = planOf(TextAnalysis.subwordFertility(spark, sf))
    // per-doc counts partially aggregate below the exchange, so the
    // shuffle carries (lang, partial) rows, not per-token rows
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"map-side combine missing:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in fertility:\n$plan")
  }
}
