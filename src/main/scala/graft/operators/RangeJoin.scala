package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketized range join: `left.value BETWEEN right.lo AND right.hi`
  * without a nested-loop plan.
  *
  * Spark's native plan for a pure interval predicate between two large
  * relations is a broadcast/cartesian nested loop — O(|L|·|R|) compares
  * and a full broadcast of one side, which dies at 100 TB. The classic
  * fix (DuckDB/Trino call these IEJoin/range-bucketing strategies): pick
  * a bucket width W, replicate each right-side interval to every
  * W-aligned bucket it covers, map each left value to its containing
  * bucket, equi-join on the bucket id, and re-check the exact BETWEEN as
  * a residual predicate. The join becomes a keyed shuffle whose fan-out
  * is span/W per interval — both sides stream, nothing broadcasts, AQE
  * handles skewed buckets like any other equi-join.
  *
  * W is the knob: too small replicates intervals, too large degrades
  * toward per-bucket nested loops. span/W ≈ small-constant is the sweet
  * spot (here band spans are ~2 buckets at the default).
  */
object RangeJoin {

  /** Generic form: rows of `left` matched to rows of `right` where
    * `left(valueCol)` lies in [`right(loCol)`, `right(hiCol)`]
    * (inclusive both ends — BETWEEN semantics). */
  def bucketed(left: DataFrame, valueCol: String,
               right: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    val bkt = (v: Column) => floor(v / bucketWidth).cast("long")
    val l = left.withColumn("__bkt", bkt(col(valueCol)))
    val r = right.withColumn("__bkt",
      explode(sequence(bkt(col(loCol)), bkt(col(hiCol)))))
    l.join(r, Seq("__bkt"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bkt")
  }

  /** Literal value bands shared by the registered query and its DuckDB
    * oracle (events.value spans ~[0, 490] in the synthetic data; the
    * last band is open-ended, and [100, 150] overlaps [120, 260] so the
    * one-to-many case is exercised). */
  val valueBands: Seq[(Long, Double, Double)] = Seq(
    (0L, 0.0, 50.0), (1L, 50.0, 100.0), (2L, 100.0, 150.0),
    (3L, 120.0, 260.0), (4L, 260.0, 1000.0))

  /** Registered query: every event tagged with the value band(s) it
    * falls in. Bands overlap, so an event can emit twice — the residual
    * BETWEEN keeps exactly the true matches. */
  def eventBands(s: SparkSession, dir: String, bucketWidth: Double = 64.0): DataFrame = {
    import s.implicits._
    val bands = valueBands.toDF("band_id", "lo", "hi")
    bucketed(Tables.events(s, dir).select(col("event_id"), col("value")),
        "value", bands, "lo", "hi", bucketWidth)
      .select(col("event_id"), col("band_id"))
      .orderBy("event_id", "band_id")
  }
}
