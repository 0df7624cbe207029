package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational query surface of the engine, exercised over the driver's
  * TPC-H-ish tables. The reference itself has no joins/aggregations
  * (SURVEY.md §2.5); these queries demonstrate the capabilities a user of
  * the engine gets "for free" from the Spark-first design, and serve as the
  * bench headliners.
  *
  * Scale notes (local[32] now, 1000-executor cluster later):
  *  - dimension joins (`customer`, `nation`, `part`, `supplier`) are
  *    explicitly `broadcast()` — at 100 TB the fact tables shuffle-join
  *    only against each other, dims never shuffle;
  *  - aggregates run partial (map-side combine) then final — guaranteed by
  *    using built-in `sum/count` over a `groupBy`, never UDAFs;
  *  - double-typed measures are summed as DECIMAL(18,2) then cast back to
  *    double: the sum is then order-independent (exact decimal addition),
  *    so results are reproducible across any partitioning / AQE re-plan —
  *    a correctness property at 100 TB, not just an oracle trick;
  *  - every filter is a plain `Column` predicate on scan columns so it
  *    pushes down to the parquet reader (verified via explain: PushedFilters).
  */
object Analytics {
  import Tables._

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-independent exact sum of a double column, returned as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** TPC-H Q1-style pricing summary: single shuffle on the 2 grouping
    * cols; partial agg makes the exchange tiny regardless of input size. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue by market segment: fact `orders` shuffle-free — `customer`
    * is broadcast, so the plan is scan→broadcast-hash-join→partial/final agg. */
  def q2SegmentRevenue(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(dsum(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")

  /** 3-way join, dims broadcast: lineitem never shuffles for the joins. */
  def q3PriorityRevenue(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(broadcast(orders(s, dir)
              .join(broadcast(customer(s, dir)),
                    col("o_custkey") === col("c_custkey"))
              .select("o_orderkey", "o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** Ranking window: one shuffle on o_custkey; deterministic tie-break. */
  def q4TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heap
    * then k-merge on the driver; no full sort, no full shuffle. */
  def q5TopKLineitems(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
              col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  /** TPC-H Q6-style selective scan-agg: both predicates push to parquet. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  /** Distinct aggregation: Spark expands to 2-phase partial-distinct. */
  def q7EventUsers(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Left-semi join (EXISTS): broadcast the key set, no fact shuffle. */
  def q8CustomersWithOrders(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(broadcast(orders(s, dir).select("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy("c_custkey")

  /** Left-anti join (NOT EXISTS): customers with no URGENT order — the
    * pushed filter shrinks the broadcast side before the anti join. */
  def q9CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(broadcast(orders(s, dir)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy("c_custkey")

  /** Set op: UNION DISTINCT of two key sets. */
  def q10NationKeysUnion(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      .union(supplier(s, dir).select(col("s_nationkey").cast("long")))
      .distinct()
      .orderBy("nationkey")

  /** ROLLUP grouping-sets aggregate over a broadcast dim join. Expressed
    * in SQL (Spark 4.1's ambiguous-self-join check misfires on
    * `Dataset.rollup` + orderBy over the grouping column); the BROADCAST
    * hint keeps the dim off the shuffle path. */
  def q11NationRollup(s: SparkSession, dir: String): DataFrame = {
    customer(s, dir).createOrReplaceTempView("graft_q11_customer")
    nation(s, dir).createOrReplaceTempView("graft_q11_nation")
    s.sql(
      """SELECT /*+ BROADCAST(n) */ n_name AS nation_name,
        | COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM graft_q11_customer c JOIN graft_q11_nation n
        |  ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name) ORDER BY nation_name NULLS FIRST""".stripMargin)
  }

  /** Event-time bucketing (batch flavor of the streaming windowed agg). */
  def q12EventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"),
               date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type", "hour")

  /** JSON extraction from the semi-structured `props` column — codegen'd
    * `get_json_object`, no UDF. */
  def q13JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Set op: EXCEPT DISTINCT — orders with no lineitems. */
  def q15Except(s: SparkSession, dir: String): DataFrame =
    orders(s, dir).select(col("o_orderkey").as("orderkey"))
      .except(lineitem(s, dir).select(col("l_orderkey")))
      .orderBy("orderkey")

  /** Set op: INTERSECT DISTINCT — nations with both. */
  def q16Intersect(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      .intersect(supplier(s, dir).select(col("s_nationkey").cast("long")))
      .orderBy("nationkey")

  /** Pivot: event counts per user bucket × event type. Pivot values are
    * listed explicitly so the schema is static (no extra distinct scan —
    * also what keeps it planner-friendly at scale). */
  def q17Pivot(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_bucket")

  /** Scalar-function sweep: string/math/date/array families in one
    * projection (the reference exposes no scalar functions at all,
    * SURVEY.md §2.5 — here the full codegen'd library is available).
    * Every function chosen has bit-identical semantics in DuckDB. */
  def q22ScalarFunctions(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        abs(col("o_totalprice") - 100000.0).as("dist_from_100k"),
        floor(col("o_totalprice") / 1000).cast("long").as("price_k"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        array_contains(split(col("o_orderpriority"), "-"), "URGENT").as("is_urgent"))
      .orderBy("o_orderkey")

  /** The salted-join scale utility registered as a first-class,
    * oracle-checked query: events (the would-be skewed fact side) join
    * customers on user id with every key spread over `factor` tasks —
    * the answer must equal the plain join, which is exactly what the
    * oracle recomputes. Salting is deterministic (content-derived, never
    * rand()) so retries and oracle runs agree. */
  def q23SkewJoin(s: SparkSession, dir: String, factor: Int = 8): DataFrame = {
    val ev = events(s, dir).select(col("user_id"), col("event_id"))
    val cust = customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedJoin(ev, cust, "user_id", factor, saltBy = Seq("event_id"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_events"))
      .orderBy("c_mktsegment")
  }

  /** The salt-factor DECISION registered as a correctness row (r16 —
    * the seventh engine decision): the same events⋈customer aggregate,
    * but the factor comes from [[Skew.chooseSaltFactor]]'s sampled key
    * histogram instead of the caller — and the decision statistics ride
    * in every output row. The sample is systematic on `event_id % mod`
    * (mod = 1 at the oracle scales), so the DuckDB oracle replays the
    * ENTIRE decision in integer arithmetic — histogram, share, the
    * ⌈topCount·P/rows⌉ clamp at the repo-standard P = 32 — alongside
    * the join counts (which must equal the plain join in every regime:
    * salting is output-invariant, and at factor 1 the machinery is
    * skipped entirely — the plan improvement the decision buys on
    * uniform corpora like this one: measured top-key share 0.86% at
    * sf0.01 → factor 1 → no build-side explode; the sf0.001 events
    * table IS skewed enough to salt — share 8.8% → factor 3). */
  def q23SkewAuto(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"), col("event_id"))
    val cust = customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val (joined, plan) = Skew.saltedJoinAuto(ev, cust, "user_id",
      sampleBy = col("event_id"), saltBy = Seq("event_id"),
      parallelism = 32)
    joined.groupBy("c_mktsegment").agg(count(lit(1)).as("n_events"))
      .select(col("c_mktsegment"), col("n_events"),
        lit(plan.factor.toLong).as("salt_factor"),
        lit(plan.topCount).as("top_key_rows"),
        lit(plan.sampledRows).as("sampled_rows"))
      .orderBy("c_mktsegment")
  }

  /** Hourly event-rate anomaly detection: flag hours whose count departs
    * the event type's mean by more than 3σ. The 3σ test is spelled in
    * INTEGER arithmetic — (cnt·n − s)²·(n−1) > 9·n·(n·ss − s²) over
    * DECIMAL(38,0) — so the boolean is exact and engine-independent;
    * a naive avg/stddev spelling would compare library-specific doubles.
    * Two keyed aggregations (hourly counts, per-type moments) + one
    * broadcast-size join back — the per-type moment table has one row
    * per event type. */
  def q24EventAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
    val d38 = "decimal(38,0)"
    val dev = (col("cnt") * col("n") - col("s")).cast(d38)
    val varNum = col("n").cast(d38) * col("ss").cast(d38) -
      col("s").cast(d38) * col("s").cast(d38)
    hourly.join(stats, "event_type")
      .select(col("event_type"), col("hour"), col("cnt"),
        when(col("n") >= 2,
          dev * dev * (col("n") - 1).cast(d38) >
            lit(9).cast(d38) * col("n").cast(d38) * varNum)
          .otherwise(lit(false)).as("is_anomaly"))
      .orderBy("event_type", "hour")
  }

  /** CUBE grouping sets over segment × nation (all four grouping
    * combinations in one pass — Catalyst expands to a single Expand +
    * aggregate, not four scans). */
  def q18Cube(s: SparkSession, dir: String): DataFrame = {
    customer(s, dir).createOrReplaceTempView("graft_q18_customer")
    nation(s, dir).createOrReplaceTempView("graft_q18_nation")
    s.sql(
      """SELECT /*+ BROADCAST(n) */ c_mktsegment, n_name AS nation_name,
        | COUNT(*) AS n_cust
        |FROM graft_q18_customer c JOIN graft_q18_nation n
        |  ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)
        |ORDER BY c_mktsegment NULLS FIRST, nation_name NULLS FIRST""".stripMargin)
  }

  /** Analytic window functions + running frame: per-customer cumulative
    * order total (unbounded-preceding frame) and the gap to the previous
    * order (lag) — the frames/analytic half of the window family (q4 is
    * the ranking half). One shuffle on o_custkey. */
  def q21RunningWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      .select(col("o_orderkey"), col("o_custkey"),
        sum(col("price")).over(frame).cast("double").as("running_total"),
        lag(col("price"), 1).over(w).cast("double").as("prev_price"),
        lead(col("price"), 1).over(w).cast("double").as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles (median/p90) per return flag — both
    * engines implement the standard linear-interpolation definition. */
  def q19Quantiles(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy("l_returnflag")
      // one percentile state for both cut points — two separate
      // percentile() aggregates each build their own full value map
      // (measured 2.7 s vs 1.8 s at sf0.1)
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"))
      .select(col("l_returnflag"), col("ps")(0).as("p50"), col("ps")(1).as("p90"))
      .orderBy("l_returnflag")

  /** Sketch aggregates: HyperLogLog distinct estimate per event type.
    * Implementation-specific estimates can't hash-match another engine's
    * HLL, so this is a rows-only query; the spec bounds its error vs the
    * exact count instead. */
  def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"))
      .orderBy("event_type")

  /** HLL error gate: the sketch estimate must land within 5% of the exact
    * distinct count per group (HLL is deterministic for a given input
    * set, so this is a stable pass/fail, oracle-checkable as constant
    * `true` per group). */
  def q20ApproxDistinctGate(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"),
           countDistinct(col("user_id")).as("exact"))
      .select(col("event_type"),
        (abs(col("approx") - col("exact")).cast("double") <=
          col("exact").cast("double") * 0.05).as("within_5pct"))
      .orderBy("event_type")

  /** GROUPING SETS with explicit grouping markers — the general form of
    * q11's ROLLUP / q18's CUBE: three chosen aggregation levels in ONE
    * pass (Catalyst expands to a single Expand + aggregate, one shuffle,
    * not three scans). The `grouping()` markers disambiguate subtotal
    * NULLs from data NULLs — the portable way to consume the result. */
  def q26GroupingSets(s: SparkSession, dir: String): DataFrame = {
    customer(s, dir).createOrReplaceTempView("graft_q26_customer")
    nation(s, dir).createOrReplaceTempView("graft_q26_nation")
    s.sql(
      """SELECT /*+ BROADCAST(n) */ c_mktsegment, n_name AS nation_name,
        | CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nat,
        | COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM graft_q26_customer c JOIN graft_q26_nation n
        |  ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), ())
        |ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST,
        |         nation_name NULLS FIRST""".stripMargin)
  }

  /** The distribution-analytic window functions q4/q21 don't cover:
    * ntile quartiles, percent_rank, cume_dist, dense_rank — per-segment
    * price distribution positions. The ORDER BY carries o_orderkey as a
    * tiebreak so every function is deterministic; percent_rank and
    * cume_dist are int/int divisions of rank counts, IEEE-exact in both
    * engines. One shuffle on the segment key. */
  def q27WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).join(
      broadcast(customer(s, dir).select("c_custkey", "c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("c_mktsegment"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        dense_rank().over(w).cast("long").as("drank"))
      .orderBy("c_mktsegment", "o_orderkey")
  }

  /** FULL OUTER join with null rows on BOTH sides: high-balance
    * customers vs active order books — the reconciliation shape (which
    * accounts have money but no orders, which have orders but modest
    * balances). Both inputs are keyed aggregates/filters of the same
    * join key, so the full outer is one sort-merge exchange pair. */
  def q28FullOuter(s: SparkSession, dir: String): DataFrame = {
    val rich = customer(s, dir)
      .filter(col("c_acctbal") > 7500)
      .select(col("c_custkey"), dec(col("c_acctbal")).cast("double").as("acctbal"))
    val active = orders(s, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 8)
    rich.join(active, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("acctbal"), col("n_orders"))
      .orderBy("custkey")
  }

  /** Per-key top-k through the custom [[graft.plans.TopKPerKey]]
    * physical operator (partial bounded heaps → survivor-sized exchange
    * → final merge) instead of the shuffle-everything window spelling;
    * the scaladoc there carries the plan rationale and measurements.
    * (o_totalprice DESC, o_orderkey ASC) is a TOTAL order — orderkey is
    * unique — so the k survivors are well-defined; the presentation rank
    * is a window over the ≤ k·|customers| survivors only, never the
    * orders table. Output doubles come from the same dec-cast rule as
    * the rest of the q-suite. */
  def q29TopKPerKey(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val o = orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
      dec(col("o_totalprice")).cast("double").as("totalprice"))
    val top = graft.plans.TopKPerKey(o, Seq(col("o_custkey")),
      Seq(col("totalprice").desc, col("o_orderkey").asc), k)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("totalprice").desc, col("o_orderkey").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .orderBy("o_custkey", "rk")
  }

  /** The DECLARATIVE top-k spelling — plain
    * `row_number().over(...) <= k`, no custom API — executed through the
    * [[graft.plans.TopKWindowRewrite]] optimizer rule, which rewrites
    * the Filter+Window pattern to run over the bounded-heap
    * [[graft.plans.TopKPerKey]] child. Same answer as [[q29TopKPerKey]]
    * (same oracle SQL pins both); TopKPerKeySpec asserts THIS query's
    * own physical plan carries TopKPerKey and no WindowGroupLimit, so a
    * silent pattern-match regression (the window spelling would still
    * give the right answer) fails a test instead of going unnoticed.
    * This is the extension ladder's missing rung made first-class: users keep
    * the idiomatic window spelling and the session's optimizer swaps the
    * physical scheme. */
  def q32TopKRewrite(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // Child session: the rule is semantics-preserving, but installing it
    // on the CALLER's session would silently re-plan every later
    // row_number<=k query in the suite depending on execution order —
    // plan selection must not be an order-dependent side effect of
    // having run this query. A production deployment that wants it
    // everywhere opts in via spark.sql.extensions (GraftExtensions).
    val s2 = s.newSession()
    graft.plans.TopKPerKey.installRewrite(s2)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("totalprice").desc, col("o_orderkey").asc)
    orders(s2, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("totalprice"),
        col("rk").cast("long").as("rk"))
      .orderBy("o_custkey", "rk")
  }

  /** Per-customer order stats WITH the bounded top-k ids, all in ONE
    * aggregate pass — the composition the custom
    * [[graft.functions.TopKKeysAgg]] aggregate exists for (its scaladoc
    * carries the three-spellings comparison). Count and exact-decimal
    * sum ride the same groupBy as the heap; no window, no second pass,
    * no join back. */
  def q30TopKAgg(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKKeysAgg(k),
      org.apache.spark.sql.Encoders.product[graft.functions.TopKEntry])
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        dec(col("o_totalprice")).as("d"),
        dec(col("o_totalprice")).cast("double").as("v"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("d")).cast("double").as("sum_price"),
        topk(col("v"), col("o_orderkey")).as("top_keys"))
      .orderBy("o_custkey")
  }

  /** Higher-order array functions — the lambda surface (`transform` /
    * `filter` / `aggregate` / `zip_with`) over per-order line arrays,
    * all codegen Catalyst expressions (no UDF): a nested collection is
    * built once per group and every derived statistic folds it
    * in-place — the shape in which array-typed feature columns (token
    * id lists, per-chunk scores) are processed at 100 TB. One
    * `l_orderkey` exchange for the collect, zero further shuffles for
    * the lambdas.
    *
    * Determinism: BOTH columns ride ONE (linenumber, qty, price) struct
    * array sorted under that total order, then project out — two
    * independently-sorted arrays would pair different rows wherever
    * `l_linenumber` repeats within an order (it does in this corpus:
    * 11.8k dup groups at sf0.01), silently corrupting every positional
    * `zip_with`. `collect_list`'s arrival order never reaches the
    * result. Money stays exact: prices become integer CENTS via the
    * decimal cast before any array math (a double→long cast would
    * TRUNCATE in Spark but ROUND in DuckDB; the decimal detour is the
    * one rendering both engines floor identically). */
  def q31HigherOrder(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir).select(col("l_orderkey"),
      struct(col("l_linenumber"), col("l_quantity").cast("long").as("q"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("p")).as("qp"))
    li.groupBy("l_orderkey")
      .agg(expr("sort_array(collect_list(qp))").as("arr"))
      .select(col("l_orderkey"),
        expr("transform(arr, x -> x.q)").as("qty_arr"),
        expr("transform(arr, x -> x.p)").as("price_arr"))
      .select(col("l_orderkey"),
        expr("cast(size(filter(qty_arr, x -> x > 25)) as bigint)").as("n_big"),
        expr("aggregate(qty_arr, 0L, (acc, x) -> acc + x)").as("total_qty"),
        expr("aggregate(zip_with(qty_arr, price_arr, (q, p) -> q * p), " +
          "0L, (acc, x) -> acc + x)").as("weighted_cents"),
        expr("array_max(transform(price_arr, x -> 2 * x))").as("doubled_max_cents"))
      .orderBy("l_orderkey")
  }

  /** Time-series densification (gap fill): monthly order counts per
    * priority over a CONTINUOUS month spine — absent (month, priority)
    * combinations appear as explicit zeros, which is what separates "no
    * orders that month" from "month missing" for any downstream
    * trend/seasonality consumer (the same reason the empty-table rule
    * makes [[Profiling.columnProfile]] emit all-zero rows). The spine is
    * `sequence(min, max, interval 1 month)` exploded from the 1-row span
    * aggregate and cross-joined with the distinct dimension values —
    * both CONTROL-PLANE sized (months in span × |priorities|), so the
    * cross join is not a data-plane product; the data-plane cost stays
    * the one keyed aggregate over orders, and the left join that
    * attaches counts broadcasts the spine side. */
  def densifyMonthly(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).select(
      date_trunc("month", col("o_orderdate")).as("m"), col("o_orderpriority"))
    val counts = o.groupBy("m", "o_orderpriority").agg(count(lit(1)).as("n"))
    val spine = o.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 month)")).as("m"))
    val dims = o.select("o_orderpriority").distinct()
    spine.crossJoin(dims)
      .join(counts, Seq("m", "o_orderpriority"), "left")
      .select(unix_millis(col("m")).as("month_ms"),
        col("o_orderpriority").as("priority"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("month_ms", "priority")
  }

  /** The engine's SQL surface: the same ANSI SQL DuckDB runs as the
    * oracle executes verbatim on `spark.sql` over registered views —
    * correlated scalar subquery included (Catalyst decorrelates it into
    * an aggregate + join). */
  def q14SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_above
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM customer WHERE c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
        |       WHERE c_nationkey = c.c_nationkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }
}
