package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.ZOrderOps

/** Z-order (Morton-curve) data layout for multi-dimensional data skipping.
  *
  * At 100 TB the scan is the dominant cost, and the scan's cost is decided
  * by LAYOUT: parquet keeps min/max statistics per row group, and a range
  * predicate skips every row group whose stats exclude it — but only if
  * the writer clustered the data so the stats are tight. Sorting by ONE
  * key makes that key's stats tight and leaves every other key's min/max
  * spanning the whole domain, so 2-D predicates (`l_partkey BETWEEN …
  * AND l_suppkey BETWEEN …` — the "this part from this supplier" audit
  * shape) still read the full table. Sorting by the interleaved Morton
  * value ([[graft.functions.ZValue]]) clusters BOTH keys at once: each
  * row group covers a small square of the (partkey, suppkey) plane, so a
  * band predicate on either — or both — dimensions prunes most groups
  * (tools/MeasureZOrder quantifies the effect on this corpus).
  *
  * This is the batch sibling of [[Bucketing]]: bucketing pre-pays the
  * JOIN shuffle at write time; z-ordering pre-pays SCAN selectivity at
  * write time. Both are the Singer-sink layout options a 100 TB
  * deployment chooses per downstream workload.
  *
  * The registered query keeps [[Bucketing.bucketedJoinQuery]]'s honest
  * framing: it WRITES the z-ordered copy (the once-paid layout cost),
  * then runs the 2-D band aggregate over it; the oracle recomputes the
  * same aggregate over the raw table, so the hash match proves layout
  * changes results in no way — it only changes what the scan can skip.
  */
object Layout {

  /** One JVM-scoped layout dir, removed on exit (Bucketing precedent:
    * a fresh temp dir per invocation would leak a lineitem copy per
    * bench/test rep). */
  private lazy val sessionLayoutDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-layout")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(p.toFile)
    }))
    p.toString
  }

  /** Small row groups so skipping is measurable at test scale factors; a
    * production writer keeps the 128 MB default (same stats, coarser
    * granularity). */
  private val RowGroupBytes = 256 * 1024

  /** Write `lineitem` clustered by z(l_partkey, l_suppkey).
    *
    * Both keys are affine-scaled to a common 16-bit range BEFORE
    * interleaving: raw interleave of a 15-bit partkey domain with a
    * 10-bit suppkey domain puts the top 5 curve bits on partkey alone,
    * so row-group-sized curve cells never subdivide suppkey below its
    * top bit and the 2-D pruning collapses to a partkey sort (measured:
    * 12% of rows read vs 2.9% with scaling, tools/MeasureZOrder). The
    * scale bounds come from one 1-row min/max aggregate (control-plane);
    * for skewed key distributions the same slot takes rank-bucket
    * boundaries instead of an affine map — the curve only needs SOME
    * equalizing value→cell function.
    *
    * `repartitionByRange` on the z-value gives disjoint curve segments
    * per output file (range exchange = one extra shuffle, the layout
    * job's only exchange); `sortWithinPartitions` orders rows inside
    * each file so row-group boundaries cut the curve into contiguous
    * squares. The z column itself is dropped — it is derivable, and the
    * skipping works off the ORIGINAL key columns' stats. */
  def writeZOrdered(s: SparkSession, dir: String, out: String,
                    nFiles: Int = 8): Unit = {
    val r = Tables.lineitem(s, dir)
      .agg(min(col("l_partkey")), max(col("l_partkey")),
           min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pMin, pMax, sMin, sMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def scaled(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else (c - lit(lo)) * lit(65535L) / lit(hi - lo)
    val zv = ZOrderOps.zvalue(
      scaled(col("l_partkey"), pMin, pMax).cast("long"),
      scaled(col("l_suppkey"), sMin, sMax).cast("long"))
    Tables.lineitem(s, dir)
      .withColumn("zv", zv)
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite")
      .option("parquet.block.size", RowGroupBytes.toLong)
      .parquet(out)
  }

  /** Write `lineitem` clustered by hilbert(l_partkey, l_suppkey) — the
    * same affine 16-bit scaling and range-exchange shape as
    * [[writeZOrdered]], with the Morton interleave swapped for the
    * Hilbert walk ([[graft.functions.HilbertValue]]). The Hilbert curve
    * never takes the Morton curve's power-of-two diagonal jumps, so
    * equal-length curve segments cover tighter (x, y) boxes → tighter
    * per-row-group min/max stats → more groups pruned for the same
    * band (tools/MeasureZOrder prints both side by side). */
  def writeHilbert(s: SparkSession, dir: String, out: String,
                   nFiles: Int = 8): Unit = {
    val r = Tables.lineitem(s, dir)
      .agg(min(col("l_partkey")), max(col("l_partkey")),
           min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pMin, pMax, sMin, sMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def scaled(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else (c - lit(lo)) * lit(65535L) / lit(hi - lo)
    val hv = graft.functions.HilbertOps.hvalue(
      scaled(col("l_partkey"), pMin, pMax).cast("long"),
      scaled(col("l_suppkey"), sMin, sMax).cast("long"))
    Tables.lineitem(s, dir)
      .withColumn("hv", hv)
      .repartitionByRange(nFiles, col("hv"))
      .sortWithinPartitions("hv")
      .drop("hv")
      .write.mode("overwrite")
      .option("parquet.block.size", RowGroupBytes.toLong)
      .parquet(out)
  }

  /** Comparison layout: same row-group size, clustered by l_partkey
    * alone — what a single-key sort gives the second dimension (nothing).
    * Used by tools/MeasureZOrder, not by the registered query. */
  def writeSingleSorted(s: SparkSession, dir: String, out: String,
                        nFiles: Int = 8): Unit =
    Tables.lineitem(s, dir)
      .repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite")
      .option("parquet.block.size", RowGroupBytes.toLong)
      .parquet(out)

  /** The self-selected 2-D band: the middle ~10% of each key domain,
    * bounds derived with integer arithmetic from the key maxima so the
    * same code is exact at any scale factor (control-plane: one 1-row
    * aggregate, the windowStatsSpooled precedent). Literal bounds —
    * not a join — so the predicate reaches the parquet scan as
    * PushedFilters and row-group stats can act on it. */
  def bandBounds(s: SparkSession, dir: String): (Long, Long, Long, Long) = {
    val r = Tables.lineitem(s, dir)
      .agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    val (pMax, sMax) = (r.getLong(0), r.getLong(1))
    (pMax * 45 / 100, pMax * 55 / 100, sMax * 45 / 100, sMax * 55 / 100)
  }

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** The registered query: write the z-ordered copy, then aggregate the
    * 2-D band over it. Result is layout-independent (the point); the
    * scan over the copy reads only the pruned row groups. */
  def zorderQuery(s: SparkSession, dir: String): DataFrame = {
    val out = s"$sessionLayoutDir/lineitem_z"
    writeZOrdered(s, dir, out)
    bandAggregate(s, dir, out)
  }

  /** The registered Hilbert query — same write-then-band shape and the
    * SAME oracle SQL as [[zorderQuery]] (layout independence is the
    * pin; the pruning DIFFERENCE between the curves is measured, not
    * oracled — tools/MeasureZOrder, BASELINE.md r12). */
  def hilbertQuery(s: SparkSession, dir: String): DataFrame = {
    val out = s"$sessionLayoutDir/lineitem_h"
    writeHilbert(s, dir, out)
    bandAggregate(s, dir, out)
  }

  private def bandAggregate(s: SparkSession, dir: String,
                            out: String): DataFrame = {
    val (pLo, pHi, sLo, sHi) = bandBounds(s, dir)
    s.read.parquet(out)
      .filter(col("l_partkey").between(pLo, pHi) &&
              col("l_suppkey").between(sLo, sHi))
      .agg(count(lit(1)).as("n_rows"),
        dec(sum(dec(col("l_quantity")))).cast("double").as("sum_qty"),
        dec(sum(dec(col("l_extendedprice")))).cast("double").as("sum_price"))
  }
}
