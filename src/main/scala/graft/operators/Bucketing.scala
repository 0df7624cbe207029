package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed-table layout for shuffle-free fact-to-fact joins.
  *
  * At 100 TB the lineitem⋈orders join is the dominant exchange: both
  * sides shuffle on the order key for every query. Bucketing both tables
  * by that key at ingest time (`bucketBy` + `sortBy`) pre-partitions and
  * pre-sorts the data on disk, so every subsequent join on the key plans
  * as a zero-Exchange sort-merge join — the shuffle is paid once at write
  * time instead of per query. This is the engine's recommended layout for
  * the Singer sink when downstream queries join on `key_properties`.
  */
object Bucketing {

  /** Write lineitem + orders bucketed by order key into the session
    * catalog (tables `lineitem_bkt`, `orders_bkt` under `warehouseDir`). */
  def writeBucketed(s: SparkSession, dir: String, warehouseDir: String,
                    nBuckets: Int = 8): Unit = {
    Tables.lineitem(s, dir).write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouseDir/lineitem_bkt")
      .saveAsTable("lineitem_bkt")
    Tables.orders(s, dir).write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouseDir/orders_bkt")
      .saveAsTable("orders_bkt")
  }

  /** One JVM-scoped warehouse dir, removed on exit: a fresh temp dir per
    * invocation leaked a full bucketed copy of lineitem+orders every
    * bench/test rep (SaveMode.Overwrite replaces the catalog entry but
    * each run wrote under a new path). Reusing one path makes repeated
    * runs overwrite in place; the shutdown hook cleans up the last copy. */
  private lazy val sessionWarehouse: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-bkt")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(p.toFile)
    }))
    p.toString
  }

  /** The layout + join as one registered, oracle-checked query: write
    * the bucketed tables into the session warehouse, run the
    * zero-Exchange join, and the result must equal the plain join the
    * oracle recomputes over the raw parquet — the honest framing of
    * bucketing's contract (the write pass IS the once-paid shuffle, so
    * the query's bench time includes it). The `*_bkt` names are
    * session-global; a shared metastore deployment should suffix them
    * per tenant. */
  def bucketedJoinQuery(s: SparkSession, dir: String): DataFrame = {
    writeBucketed(s, dir, sessionWarehouse)
    bucketedJoin(s)
  }

  /** Revenue per order priority over the bucketed tables — the join
    * carries no Exchange (verified by BucketingSpec against the physical
    * plan). */
  def bucketedJoin(s: SparkSession): DataFrame =
    s.table("lineitem_bkt")
      .join(s.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
}
