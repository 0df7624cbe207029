package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * All operators take the scale-factor directory explicitly so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) —
  * and, unchanged, against a 100 TB s3a:// prefix on a real cluster: the
  * reads are plain parquet scans, so partition pruning / column pruning /
  * predicate pushdown all apply.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark rejects by
    * default; read it as a nanos long and rebuild a (µs-truncated)
    * TimestampType column.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` at session
    * build (all graft mains and the test harness set it). The loader
    * deliberately does NOT set it here: mutating session config inside a
    * table loader is a global side effect that would surprise a shared
    * session. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(events.parquet is TIMESTAMP(NANOS))")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so `spark.sql` works over the
    * whole corpus — the engine's SQL surface. */
  def registerAll(s: SparkSession, d: String): Unit = names.foreach {
    case "events" => events(s, d).createOrReplaceTempView("events")
    case n => table(s, d, n).createOrReplaceTempView(n)
  }
}
