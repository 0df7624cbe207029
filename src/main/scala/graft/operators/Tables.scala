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

  /** `events.ts` normalization: every operator downstream assumes a µs
    * `TimestampType` (LTZ) column, but the driver's generator has shipped
    * the column as parquet TIMESTAMP(NANOS) (rounds 1–6) and as µs
    * TIMESTAMP_NTZ (round 7 regeneration), so the loader accepts all
    * three physical shapes:
    *
    *  - nanos-as-long (`spark.sql.legacy.parquet.nanosAsLong=true`, which
    *    all graft mains and the test harness still set — harmless when no
    *    nanos column exists): rebuild a µs-truncated timestamp;
    *  - TIMESTAMP_NTZ: reinterpret the wall time as UTC. The cast is done
    *    via `to_timestamp_ltz` under an explicit UTC requirement rather
    *    than the session default so a non-UTC session cannot silently
    *    shift event times away from what the DuckDB oracle (which reads
    *    the same naive µs values) computes;
    *  - TimestampType: already the contract shape.
    *
    * The loader deliberately does NOT set session config here: mutating
    * config inside a table loader is a global side effect that would
    * surprise a shared session. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read under nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Normalized comparison: "Etc/UTC", "+00:00" and "Z" are all the
        // UTC rules and the cast is equally safe under them — a literal
        // string match rejected sessions that were already in UTC.
        val tz = s.conf.get("spark.sql.session.timeZone")
        val isUtc =
          try java.time.ZoneId.of(tz).getRules == java.time.ZoneOffset.UTC.getRules
          catch { case _: java.time.DateTimeException => false }
        require(isUtc,
          s"set spark.sql.session.timeZone to UTC at session build (got '$tz'): " +
            "events.ts is TIMESTAMP_NTZ and the NTZ->LTZ cast must not shift it")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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
