package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.events

/** Event-sequence analytics over the `events` table — the funnel /
  * retention / journey triad every event-analytics engine ships. The
  * reference has no query surface at all (SURVEY.md §2.5); these are
  * north-star extensions in the same spirit as the relational q-suite.
  *
  * All three share one scale shape: a single hash exchange on `user_id`
  * followed by a per-user sort (the window), then a small keyed
  * aggregate. Nothing is ever all-pairs and no per-user state leaves the
  * executor — at 100 TB the cost is one shuffle of the events table, the
  * same bound as any groupBy(user). Timestamps are compared as exact
  * epoch-microsecond longs (`unix_micros`), the [[Tables.events]] loader's
  * native precision, so ordering and strict-inequality semantics are
  * bit-identical in DuckDB (`epoch_us`); ties break on `event_id`.
  */
object EventAnalytics {

  private def base(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("tus"))

  /** Ordered conversion funnel: how many users complete each prefix of
    * `steps`, where step k must occur STRICTLY after the user's earliest
    * completion of step k-1 (the greedy earliest chain — if any
    * time-ordered chain exists, the greedy one does, so this counts
    * exactly the users with a full ordered traversal).
    *
    * Per user the chain is a cascade of running minima over one
    * event-time sort: m₀ = running min of step-0 times; qₖ = this row's
    * time if it is a step-k event after mₖ₋₁; mₖ = running min of qₖ.
    * Catalyst stacks the k dependent Window projections over ONE
    * partition-by-user sort — one exchange total — and the per-user
    * flags then aggregate without re-shuffling (same key). Output is one
    * exact-integer row per step: (step_no, step, n_users). */
  def funnel(s: SparkSession, dir: String,
             steps: Seq[String] = Seq("signup", "view", "click", "purchase"))
  : DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = base(s, dir)
    steps.zipWithIndex.foreach { case (st, i) =>
      val q: Column =
        if (i == 0) when(col("event_type") === st, col("tus"))
        else when(col("event_type") === st && col(s"m${i - 1}").isNotNull &&
          col("tus") > col(s"m${i - 1}"), col("tus"))
      df = df.withColumn(s"m$i", min(q).over(w))
    }
    val flags = steps.indices.map(i =>
      max(when(col(s"m$i").isNotNull, 1L).otherwise(0L)).as(s"r$i"))
    val perUser = df.groupBy("user_id").agg(flags.head, flags.tail: _*)
    val totals = perUser.agg(
      sum(col("r0")).as("c0"),
      steps.indices.tail.map(i => sum(col(s"r$i")).as(s"c$i")): _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).cast("long").as("step_no"), lit(st).as("step"),
        col(s"c$i").cast("long").as("n_users"))
    }
    totals.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_no"), col("r.step"), col("r.n_users"))
      .orderBy("step_no")
  }

  /** Weekly retention cohorts: users grouped by the epoch-week of their
    * FIRST event; for each (cohort_week, week_offset) the number of
    * distinct cohort members active that many weeks later. All integer
    * arithmetic on epoch-µs day indices (`div` floor division on
    * positives), so both engines produce identical keys.
    *
    * Plan: the first-event day rides a partition-by-user window min on
    * the same exchange the funnel uses (no join back to events), then
    * one distinct-aggregate exchange on (cohort_week, week_offset) —
    * count(DISTINCT user) partially dedups map-side. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val day = expr("tus div 86400000000").as("day")
    val wu = Window.partitionBy("user_id")
    base(s, dir).select(col("user_id"), day)
      .withColumn("d0", min(col("day")).over(wu))
      .select(col("user_id"),
        expr("d0 div 7").as("cohort_week"),
        expr("(day - d0) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Batch gap sessionization — the gaps-and-islands window pattern, the
    * batch twin of the streaming family's `sessionize` (same semantics,
    * same oracle SQL): a session break is a gap > `gapMs` between a
    * user's consecutive events; the running sum of breaks is the session
    * id; one aggregate per (user, session). Epoch-MILLISECOND arithmetic
    * mirrors the streaming operator's `Timestamp.getTime` floors, so all
    * three computations (batch, streaming, DuckDB) agree bit-for-bit.
    * Same single user_id exchange as the rest of the triad — the lag,
    * the running sum and the final aggregate all reuse one partitioning. */
  def sessions(s: SparkSession, dir: String,
               gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val e = base(s, dir).select(col("user_id"), expr("tus div 1000").as("tms"))
    val w = Window.partitionBy("user_id").orderBy("tms")
    val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("brk",
        when(col("tms") - lag(col("tms"), 1).over(w) > gapMs, 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(wrun))
      .groupBy("user_id", "grp")
      .agg(min(col("tms")).as("session_start_ms"),
        max(col("tms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .orderBy("user_id", "session_start_ms")
  }

  /** [[sessions]] via Spark's NATIVE `session_window` aggregate — the
    * built-in the custom lag/cumsum formulation should defer to where
    * semantics allow (SURVEY §7: compose existing ops first). They allow
    * with NO gap adjustment: Spark merges session windows that touch
    * (an event at exactly `prev + gap` still merges — verified by the
    * boundary fixture in EventAnalyticsSpec, which also refutes the
    * tempting half-open reading), which is precisely [[sessions]]'
    * "break only when the gap EXCEEDS gapMs" rule. The spec pins
    * bit-identity against [[sessions]] at the exact boundary and on the
    * real corpus; the same DuckDB oracle checks both queries.
    *
    * Plan difference worth knowing at scale: the window/cumsum path is
    * Exchange → Sort → Window → Window → HashAggregate; the native path
    * is one UpdatingSessionsExec-style aggregate over the same exchange
    * with NO window functions — sessions merge inside the aggregate
    * buffer, so wide user histories never materialize running-sum
    * columns. */
  def sessionsNative(s: SparkSession, dir: String,
                     gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val e = base(s, dir).select(col("user_id"), expr("tus div 1000").as("tms"))
    e.withColumn("ts", timestamp_millis(col("tms")))
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMs milliseconds"))
      .agg(min(col("tms")).as("session_start_ms"),
        max(col("tms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .orderBy("user_id", "session_start_ms")
  }

  /** User-journey transition counts: for every consecutive pair of
    * events per user (event-time order, `event_id` tie-break), how often
    * each `event_type → event_type` transition occurs — the Markov
    * transition matrix journey-mining and next-event models start from.
    *
    * One lead() over the shared per-user sort, then a tiny
    * (|types|² ≤ 25-row) keyed aggregate with map-side combine. */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    base(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Batch CDC MERGE — the Delta/Iceberg `MERGE INTO` semantics
    * expressed on plain DataFrames: a settled current-state table
    * (last value per user over the settled event split, the repo's
    * standard `% 10 != 0`) absorbs a change batch (the `% 10 == 0`
    * increment, reduced to its last event per user) under the three
    * canonical actions —
    *
    *  - matched + change's final event is an `error` → DELETE,
    *  - matched otherwise → UPDATE to the change's value,
    *  - not matched (new user) → INSERT (unless the lone change is an
    *    `error`, which deletes a row that never existed — a no-op, the
    *    MERGE edge case implementations get wrong most often).
    *
    * Output carries the action taken (`kept`/`updated`/`inserted`) so
    * the row provenance is auditable. Plan shape: each side reduces to
    * one row per user WITH its own user_id exchange, then a full-outer
    * join on the SAME key — Catalyst reuses the aggregates'
    * partitioning, so the join adds no third exchange; at 100 TB the
    * cost is the two aggregations (the change side's tracking batch
    * size, not corpus size). */
  def cdcMerge(s: SparkSession, dir: String): DataFrame =
    cdcMergeFrom(events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("tus")))

  /** [[cdcMerge]] over an explicit (user_id, event_id, event_type,
    * value, tus) log — exposed so the spec can pin each MERGE action
    * (incl. the delete-of-nonexistent no-op) on crafted rows. */
  private[graft] def cdcMergeFrom(e: DataFrame): DataFrame = {
    def lastPerUser(side: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus").desc, col("event_id").desc)
      side.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("value"))
    }
    val target = lastPerUser(e.filter(col("event_id") % 10 =!= 0))
      .select(col("user_id"), col("value").as("t_value"))
    val source = lastPerUser(e.filter(col("event_id") % 10 === 0))
      .select(col("user_id"), col("event_type").as("s_type"),
        col("value").as("s_value"))
    target.join(source, Seq("user_id"), "full_outer")
      // DELETE; explicit null-arm — a bare !(s_type = 'error') is NULL
      // (so dropped) on every target-only row
      .filter(col("s_type").isNull || col("s_type") =!= "error")
      .select(col("user_id"),
        coalesce(col("s_value"), col("t_value")).as("value"),
        when(col("s_value").isNull, "kept")
          .when(col("t_value").isNull, "inserted")
          .otherwise("updated").as("action"))
      .orderBy("user_id")
  }

  /** Slowly-changing-dimension type-2 history build from a change
    * stream — the warehouse-side dimension-versioning operator
    * ([[graft.streaming.StreamingAnalytics]]'s `upsertSpooled` keeps only
    * the LAST value per key; this keeps the full validity history):
    * per user, consecutive events carrying the SAME `value` collapse
    * into one version (no-change records must not open a new row — the
    * defining SCD2 merge rule), each change opens a version row with
    * `valid_from_us` = its event time and `valid_to_us` = the next
    * version's start (null on the current version).
    *
    * Plan shape: ONE hash exchange on `user_id` feeds every step —
    * the change-detect `lag`, the version-numbering `row_number` and
    * the `lead` that closes intervals are all windows over the same
    * (user_id; tus, event_id) sort, and the change filter between them
    * preserves the partitioning, so Catalyst plans a single Exchange
    * with stacked Window operators. Versions-per-user state never
    * leaves the executor; at 100 TB the cost is the same one shuffle
    * as any per-user aggregate. Times are exact epoch-µs longs and
    * `value` passes through verbatim (the change compare is exact
    * double equality on identical parquet bits), so the history is
    * hash-identical cross-engine. */
  def scd2History(s: SparkSession, dir: String): DataFrame =
    scd2From(events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("tus")))

  /** [[scd2History]] over an explicit (user_id, event_id, value, tus)
    * change relation — exposed so the spec can pin the collapse rule on
    * crafted repeats (the synthetic corpus never repeats a value
    * consecutively, so the registered oracle row alone would leave the
    * defining SCD2 rule untested). */
  private[graft] def scd2From(changeLog: DataFrame): DataFrame = {
    val ord = Seq(col("tus"), col("event_id"))
    val wAll = Window.partitionBy("user_id").orderBy(ord: _*)
    val changes = changeLog
      .withColumn("pv", lag(col("value"), 1).over(wAll))
      .filter(col("pv").isNull || col("pv") =!= col("value"))
    val wVer = Window.partitionBy("user_id").orderBy(ord: _*)
    changes
      .withColumn("version_no", row_number().over(wVer).cast("long"))
      .withColumn("valid_to_us", lead(col("tus"), 1).over(wVer))
      .select(col("user_id"), col("version_no"),
        col("tus").as("valid_from_us"), col("valid_to_us"), col("value"))
      .orderBy("user_id", "version_no")
  }

  /** Top-k behavioral PATHS: the most common length-3 consecutive
    * event-type sequences across all users — the sequence-mining step
    * past [[transitions]]' single-hop Markov counts (a funnel tells you
    * whether users reach purchase; the path table tells you HOW they
    * get there and which detours dominate). Consecutive means adjacent
    * in the user's exact (tus, event_id) order — the same ordering
    * contract as every operator in this file.
    *
    * Plan: the same one-exchange shape as [[transitions]] — two
    * stacked `lead`s over one partition-by-user sort, a
    * map-side-combined count on the (s1, s2, s3) triple (bounded by
    * |event_type|³, a tiny domain), TakeOrderedAndProject for the
    * top-k and a rank window over the k survivors only. */
  def topPaths(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val wr = Window.orderBy(col("n").desc, col("step1"), col("step2"),
      col("step3"))
    base(s, dir)
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("s2").as("step2"),
        col("s3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
      .withColumn("rk", row_number().over(wr).cast("long"))
      .select("rk", "step1", "step2", "step3", "n")
      .orderBy("rk")
  }

  /** Exact global rank of every row under `order` (a TOTAL order — the
    * caller appends a unique tiebreak column), computed without a
    * single-partition exchange: range-repartition into an EXPLICIT
    * partition count (explicit counts are exempt from AQE coalescing,
    * so the physical row order below stays the sorted order), sort
    * within partitions, stamp `monotonically_increasing_id` (by
    * contract = partitionId·2³³ + position-within-partition), then read
    * the ≤P per-partition counts onto the driver — a control-plane
    * read, P rows — and broadcast the prefix-sum offsets back:
    * rank = offset(pid) + localPos + 1. The ranked relation is
    * local-checkpointed FIRST so the offset read and the final join see
    * the same materialized (pid, localPos) stamps — a recomputed range
    * shuffle may re-sample different boundaries, and mixing two
    * samplings would mis-pair offsets with positions (the classic
    * zipWithIndex hazard; rank itself is boundary-independent since the
    * order is total). The checkpoint is therefore NOT optional here;
    * plan-shape specs that need the un-truncated lineage use
    * [[rangedRankPlanOnly]], whose execution is structurally poisoned.
    *
    * Scale shape: ONE range-partitioned exchange of the input — every
    * partition sorts its own slice in parallel; nothing ever moves to
    * one task (`row_number` over an unpartitioned `Window.orderBy`
    * plans `Exchange SinglePartition` — WindowExec does NOT range
    * partition — which is exactly what this helper replaces). */
  private[operators] def rangedRank(s: SparkSession, df: DataFrame,
      order: Seq[Column], rkName: String): DataFrame = {
    val stamped = stampRanged(s, df, order).localCheckpoint(true)
    val counts = stamped
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect() // control-plane: at most P rows
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = counts.map { case (pid, cnt) =>
      val row = (pid, acc); acc += cnt; row }
    import s.implicits._
    val offs = s.createDataset(offRows.toIndexedSeq).toDF("__pid", "__off")
    joinOffsets(stamped, offs, rkName, poisoned = false)
  }

  /** [[rangedRank]] with the full lineage VISIBLE — for plan-shape
    * inspection only (ADVICE r13: the old `checkpoint = false` knob
    * produced potentially WRONG ranks if ever executed, because the
    * offset collect and the final join could re-sample different range
    * boundaries). This variant makes the hazard structural: offsets are
    * a zero placeholder built without ever executing the child (no
    * collect), and the rank expression carries a non-foldable
    * `assert_true` that fails EVERY row — the relation plans like the
    * real thing (same range exchange, same broadcast-offset join) but
    * cannot be executed into wrong answers. */
  private[operators] def rangedRankPlanOnly(s: SparkSession, df: DataFrame,
      order: Seq[Column], rkName: String): DataFrame = {
    val p = math.max(1, s.sessionState.conf.numShufflePartitions)
    val offs = s.range(p).select(col("id").as("__pid"), lit(0L).as("__off"))
    joinOffsets(stampRanged(s, df, order), offs, rkName, poisoned = true)
  }

  private def stampRanged(s: SparkSession, df: DataFrame,
      order: Seq[Column]): DataFrame = {
    val p = math.max(1, s.sessionState.conf.numShufflePartitions)
    df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
  }

  private def joinOffsets(stamped: DataFrame, offs: DataFrame,
      rkName: String, poisoned: Boolean): DataFrame = {
    val mask = (1L << 33) - 1
    val rank = col("__off") + col("__mid").bitwiseAND(lit(mask)) + lit(1L)
    // The poison pin: `__off` is identically 0 in the plan-only
    // placeholder, so the assertion throws on the FIRST row any
    // execution produces; it references a column, so constant folding
    // cannot trip it during planning.
    val rkExpr = if (!poisoned) rank
      else rank + coalesce(assert_true(col("__off") =!= 0L,
        lit("rangedRankPlanOnly is for plan inspection; executing it " +
          "would mis-pair offsets with a re-sampled range shuffle"))
        .cast("long"), lit(0L))
    stamped
      .join(broadcast(offs), shiftright(col("__mid"), 33) === col("__pid"))
      .withColumn(rkName, rkExpr)
      .drop("__mid", "__pid", "__off")
  }

  /** RFM SCORING — the recency/frequency/monetary user segmentation
    * every growth/analytics stack derives from the event stream: per
    * user, hours since last activity (against the corpus max event time
    * — exact integer hours), event count, and value total in exact
    * cents; each dimension scored 1–5 by exact rank arithmetic
    * (score = ⌊5·(rank−1)/n⌋+1 over a deterministic (metric, user_id)
    * order — NO ntile, whose bucket-remainder placement is an
    * engine-specific detail the exact formula sidesteps). 5 = most
    * recent / most frequent / highest value; `rfm` concatenates the
    * three digits.
    *
    * Scale shape: one event scan → user-keyed aggregate, then three
    * [[rangedRank]] passes — each a RANGE-PARTITIONED parallel sort of
    * the user dimension with driver-broadcast partition offsets, never
    * an `Exchange SinglePartition` (the r12 spelling's three
    * unpartitioned `row_number` windows each moved ALL users to one
    * task — at 10⁹ users that OOMs one executor; plan-pinned gone in
    * PlanShapeSpec) — and three user-keyed joins to reassemble. */
  def rfmScores(s: SparkSession, dir: String): DataFrame =
    rfmScoresImpl(s, dir, checkpoint = true)

  private[operators] def rfmScoresImpl(s: SparkSession, dir: String,
      checkpoint: Boolean): DataFrame = {
    val per0 = events(s, dir)
      .groupBy("user_id")
      .agg(max(unix_millis(col("ts"))).as("last_ms"),
        count(lit(1)).as("f_n"),
        sum(round(col("value") * 100).cast("long")).as("m_cents"))
    val tot = per0.agg(max("last_ms").as("max_ms"),
      count(lit(1)).as("n_users"))
    val per1 = per0.crossJoin(broadcast(tot)) // 1-row totals
      .withColumn("r_hours",
        expr("(max_ms - last_ms) div 3600000")) // exact integral hours
    // one materialization of the user aggregate; three ranks read it
    val per = if (checkpoint) per1.localCheckpoint(true) else per1
    def rk(metric: String, desc: Boolean, name: String): DataFrame = {
      val m = if (desc) col(metric).desc else col(metric).asc
      (if (checkpoint)
        rangedRank(s, per.select(col("user_id"), col(metric)),
          Seq(m, col("user_id").asc), name)
      else // plan inspection: full lineage, execution poisoned
        rangedRankPlanOnly(s, per.select(col("user_id"), col(metric)),
          Seq(m, col("user_id").asc), name))
        .select("user_id", name)
    }
    per
      .join(rk("r_hours", desc = true, "rk_r"), "user_id")
      .join(rk("f_n", desc = false, "rk_f"), "user_id")
      .join(rk("m_cents", desc = false, "rk_m"), "user_id")
      // div, not /: exact integral quintile arithmetic at any n_users
      .withColumn("r_score", expr("(5 * (rk_r - 1)) div n_users + 1"))
      .withColumn("f_score", expr("(5 * (rk_f - 1)) div n_users + 1"))
      .withColumn("m_score", expr("(5 * (rk_m - 1)) div n_users + 1"))
      .select(col("user_id"), col("r_hours"), col("f_n"), col("m_cents"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm"))
      .orderBy("user_id")
  }

  /** A/B EXPERIMENT READOUT — the two-proportion contingency test every
    * experimentation platform reduces to: users split into variants by
    * id parity (the deterministic assignment hash), per-user conversion
    * is a comparative behavioral metric (more purchases than clicks —
    * non-degenerate on this corpus at ~39% vs ~51%), and the readout is
    * one row of exact integers: per-arm counts, conversion in exact ppm
    * (integral div), and the χ² statistic in micro-units —
    * N·(ad−bc)²·10⁶ div (row₁·row₂·col₁·col₂), computed in
    * decimal(38,0) (exact to ~3·10⁷ users per arm; past that
    * [[abTestZ]] — the registered z-score double twin — is the
    * production path, this spelling is the oracle-pinnable one). A
    * degenerate corpus (zero or all users convert) zeroes a χ²
    * marginal: the statistic is guarded to an agreed NULL on both
    * engines (Spark's non-ANSI decimal div returns NULL where DuckDB's
    * `//` raises, so the oracle spells the same guard as NULLIF).
    *
    * Scale shape: one event scan → user-keyed aggregate → a four-cell
    * conditional aggregate; the test statistic is arithmetic on one
    * row. */
  def abTest(s: SparkSession, dir: String): DataFrame = {
    val conv = events(s, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nc"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"),
        when(col("np") > col("nc"), 1L).otherwise(0L).as("conv"))
    conv.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("conv_b"))
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        // empty-arm guard matches the chi2 CASE (ADVICE r13): Spark's
        // non-ANSI div yields NULL at n=0 while DuckDB's // raises, so
        // the NULL must be explicit and identical on both engines
        "case when n_a = 0 then cast(null as bigint) " +
          "else (conv_a * 1000000) div n_a end as conv_a_ppm",
        "case when n_b = 0 then cast(null as bigint) " +
          "else (conv_b * 1000000) div n_b end as conv_b_ppm",
        """case when n_a = 0 or n_b = 0 or (conv_a + conv_b) = 0
                 or ((n_a - conv_a) + (n_b - conv_b)) = 0
           then cast(null as bigint)
           else cast(
             (cast(n_a + n_b as decimal(38,0)) *
              cast(conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b
                   as decimal(38,0)) *
              cast(conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b
                   as decimal(38,0)) * 1000000)
             div (cast(n_a as decimal(38,0)) * n_b * (conv_a + conv_b) *
                  ((n_a - conv_a) + (n_b - conv_b)))
             as bigint) end as chi2_micro""")
  }

  /** A/B readout, z-score spelling — the PRODUCTION path past the
    * decimal(38,0) exact leg's ~3·10⁷-users-per-arm ceiling (N·(ad−bc)²
    * overflows 38 digits there; doubles don't): the two-proportion
    * pooled z statistic z = (p̂_a−p̂_b)/√(p̂(1−p̂)(1/n_a+1/n_b)), whose
    * square IS the 2×2 Pearson χ² — so the row carries its own
    * tolerance gate, `agree` = |z²·10⁶ − chi2_micro| ≤ 1000, pinning
    * the float spelling to the exact-decimal leg in-row (the
    * bruteForceTopK float-stability convention: ship the float path
    * WITH its agreement bit, never alone). Every double op (casts,
    * divisions, sqrt) is spelled identically in the oracle — IEEE
    * correctly-rounded, so the stored bits hash-match.
    *
    * Scale shape: identical to [[abTest]] — one event scan, one
    * user-keyed aggregate, a four-cell conditional aggregate, then
    * arithmetic on one row. */
  def abTestZ(s: SparkSession, dir: String): DataFrame =
    abTest(s, dir).selectExpr("n_a", "conv_a", "n_b", "conv_b",
        """case when n_a = 0 or n_b = 0 or (conv_a + conv_b) = 0
                 or ((n_a - conv_a) + (n_b - conv_b)) = 0
           then cast(null as double)
           else (cast(conv_a as double) / cast(n_a as double) -
                 cast(conv_b as double) / cast(n_b as double)) /
                sqrt((cast(conv_a + conv_b as double) /
                      cast(n_a + n_b as double)) *
                     (1.0 - cast(conv_a + conv_b as double) /
                            cast(n_a + n_b as double)) *
                     (1.0 / cast(n_a as double) +
                      1.0 / cast(n_b as double))) end as z""",
        "chi2_micro")
      .selectExpr("n_a", "conv_a", "n_b", "conv_b", "z", "chi2_micro",
        """case when chi2_micro is null or z is null
           then cast(null as boolean)
           else abs(z * z * 1000000.0 - cast(chi2_micro as double))
                <= 1000.0 end as agree""")

  /** OHLC DOWNSAMPLING — the gauge/metric rollup every observability and
    * feature-store pipeline runs before retention ("keep hourly
    * open/high/low/close, drop the raw points"): per (event_type, hour)
    * the first and last value in event-time order (ties broken by
    * event_id — deterministic), the min/max, the count, and the value
    * sum in exact cents (ROUND(value·100) — identical half-up rounding
    * in both engines; a raw double sum would be association-order-
    * dependent and is deliberately absent). Open/close are
    * `min_by`/`max_by` on the (ts, event_id) struct — the SAME spelling
    * as the streaming twin [[graft.streaming.StreamingAnalytics]]'
    * stream_ohlc (bit-identical output, spec-pinned); DuckDB's
    * `arg_min`/`arg_max` match exactly, the repo's recorded
    * equivalence.
    *
    * Scale shape: ONE keyed aggregate on (event_type, bucket). The
    * struct-keyed min_by buffer is not hash-aggregable, so Spark plans
    * a SortAggregate — two GROUPING-KEY-ONLY local sorts (partial +
    * final), with the partial aggregate combining map-side: the
    * exchange carries one row per (key, input partition). The r12
    * window spelling shuffled EVERY event row and sorted twice by
    * (key, ts, event_id) — strictly more bytes moved and longer sort
    * keys (ADVICE r12; plan-pinned in PlanShapeSpec). At 100 TB the
    * buckets ARE the retention unit, so state per key is one row and
    * the output is the compacted table itself. */
  /** The inline 10x event corpus — the scale-correctness construction
    * for the event/stream families (the [[graft.operators.Dedup]]
    * docs10x convention): 10 copies of the events table, copy c's
    * timestamps shifted c·192 h (whole hours — bucket alignment is
    * preserved) and its event_ids shifted c·(max id + 1). The corpus
    * SPANS more than 192 h, so copies overlap in event time and many
    * hourly windows hold rows from several copies — deliberately: the
    * scaled row then exercises denser per-window state, and both
    * engines replay the identical arithmetic, so overlap costs nothing
    * in exactness. (The spooled execution delivers all copies in batch
    * one; the watermark only advances after it, so nothing is ever
    * late-dropped regardless of overlap.)
    * Epoch-µs arithmetic on both engines: the DuckDB oracle replays
    * `epoch_us(ts) + c·691200000000` literally, so the construction is
    * hash-exact, not merely equivalent. The 1-row max-id read is a
    * control-plane head(), the docs10x shift precedent. */
  private[graft] def events10x(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("ts"), col("event_id"),
      col("event_type"), col("value"))
    // ADVICE r15: max() over an empty table is NULL — fail with the
    // offending dir named instead of an opaque NPE three frames deep
    val maxRow = ev.agg(max(col("event_id"))).head()
    require(!maxRow.isNullAt(0),
      s"events10x: events table under $dir is empty — no max(event_id) " +
        "to shift copies by")
    val shift = maxRow.getLong(0) + 1
    ev.select(explode(sequence(lit(0L), lit(9L))).as("c"), col("ts"),
        col("event_id"), col("event_type"), col("value"))
      .select(
        timestamp_micros(unix_micros(col("ts")) +
          col("c") * lit(691200000000L)).as("ts"),
        (col("event_id") + col("c") * lit(shift)).as("event_id"),
        col("event_type"), col("value"))
  }

  def downsampleOhlc(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_type"),
      date_trunc("hour", col("ts")).as("bucket"),
      col("ts"), col("event_id"), col("value"))
    e.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy("event_type", "bucket")
  }
}
