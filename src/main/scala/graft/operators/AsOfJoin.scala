package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** AS-OF join — an operator Spark lacks natively: for each left row, the
  * most recent right row with the same key and `right.ts <= left.ts`.
  *
  * Implemented by composition (SURVEY.md §7.5 preference (a)): tag both
  * sides, union, and carry the latest right payload forward with a
  * running `last(ignoreNulls)` window. ONE shuffle on the key — at 100 TB
  * this beats the per-row subquery formulation (quadratic) and the
  * range-join formulation (needs binning); it is exactly how streaming
  * engines sequence-join, so the same plan serves the batch and the
  * `mapGroupsWithState` streaming variants.
  */
object AsOfJoin {

  /** Left as-of join. `carry` columns from `right` are appended to every
    * `left` row (null when no right row precedes it). Ties on `ts` order
    * right-before-left (inclusive semantics, like DuckDB's ASOF). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carrySchema = right.select(carry.map(right(_)): _*).schema
    val leftSchema = left.schema
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
          struct(leftCols.map(left(_)): _*).as("__l"),
          lit(null).cast(carrySchema).as("__carry")): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"),
          lit(null).cast(leftSchema).as("__l"),
          struct(carry.map(right(_)): _*).as("__carry")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("__asof", last("__carry", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
              carry.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Query entry: attribute each `error` event to the same user's most
    * recent preceding `purchase` event. */
  def errorsToPurchases(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    asOf(errors, purchases, key = "user_id", ts = "ts", carry = Seq("purchase_id"))
      .select(col("event_id"), col("asof_purchase_id").as("purchase_event_id"))
      .orderBy("event_id")
  }
}
