package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the per-column inventory (row count, null count,
  * EXACT distinct cardinality) a pipeline runs before trusting a new
  * 100-TB drop: schema drift shows up as distinct-count cliffs, broken
  * upstream joins as null spikes. Works over any DataFrame; the
  * registered query profiles `lineitem` (the widest test table).
  *
  * Scale shape — the two standard traps and why this plan avoids both:
  *
  *  1. One `agg(count distinct c1, count distinct c2, ...)` row: Spark
  *     plans N distinct aggregates in one Aggregate as an Expand with one
  *     projection per distinct column — an N× row blowup THROUGH the
  *     exchange.
  *  2. One scan per column: N full table reads.
  *
  *  Instead the table is melted ONCE with `stack` (codegen, one scan)
  *  into (col_name, value-as-string) rows, and every statistic is an
  *  aggregate over that one relation. The melt is an N× expansion too,
  *  but it feeds straight into the partial hash aggregate on
  *  (col_name, value) IN THE SAME STAGE — the exchange carries only each
  *  partition's distinct (column, value) pairs, bounded by value
  *  cardinality, not rows × columns. The per-group count-distinct is the
  *  planner's two-phase rewrite (keys+value partial, then keys), no
  *  Expand anywhere.
  *
  * The string rendering exists only to give the melt one value type; it
  * is injective per column (Java's double/timestamp formatting maps
  * distinct values to distinct strings), so the distinct counts equal
  * DuckDB's over the raw columns — which is what the oracle checks, all
  * BIGINT, no float formatting in the output. */
object Profiling {

  def columnProfile(t: DataFrame): DataFrame = {
    val cols = t.columns
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', cast($c as string)").mkString(", ") +
      ") as (col_name, value)"
    // Same compute-bound-expansion rule as Dedup.substrDupSpans: the
    // melt + partial aggregate needs tasks ∝ output rows, and a small
    // single-split input would serialize it on one core (explicit count
    // because AQE coalesces a bare repartition of small data to one
    // partition). Round-robin is fine — no key is needed before the
    // (col_name, value) hash aggregate.
    t.repartition(t.sparkSession.sparkContext.defaultParallelism)
      .select(expr(stackExpr))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("value"))).as("n_nulls"),
        count_distinct(col("value")).as("n_distinct"))
      .orderBy("col_name")
  }

  def lineitemProfile(s: SparkSession, dir: String): DataFrame =
    columnProfile(Tables.lineitem(s, dir))
}
