package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Streaming-family scale probe (judge r11 Next #5): the r11 probe
  * covered batch only, and the r11 state table was the NO-eviction
  * upper bound. This feeds 1x and 10x corpora through the four
  * heaviest streaming operators in chronological chunks WITH
  * production lateness ("10 minutes"), so watermark eviction is live,
  * and records per-chunk wall + state rows/bytes — the steady-state
  * deployment numbers.
  *
  * 10x STREAM corpus (built once under `target/scale10stream`,
  * seed-free):
  *   - events: 10 copies, user_id shifted by k*(max+1), SAME time
  *     range — the deployment scale axis is events/second and
  *     keys/window, not a longer history;
  *   - documents: 10 per-copy-Caesar copies ([[graft.operators.Dedup
  *     .caesarTo]], the shared 10x alphabets) with INTERLEAVED ids
  *     (doc_id*10+k), so a `doc_id < L` prefix draws L/10 base docs
  *     from EVERY copy — 10x the docs through the same stream window,
  *     not one unscaled copy.
  *
  * Doc streams get a synthetic chronology: doc rank r arrives at
  * 86400000 + r*msPerDoc with msPerDoc sized so each chunk spans
  * ~20 minutes (2x the lateness horizon) — by the time chunk k+1
  * processes, chunk k's state is evictable, so the curve shows
  * steady-state, not accumulation. Expected shapes: exact distinct
  * state ~ keys-in-horizon (10x at 10x), HLL ~ registers-per-window
  * (flat), dedup ~ hashes-in-horizon, neardup ~ band entries in
  * horizon.
  */
object StreamScaleProbe {

  def buildScaledStream(s: SparkSession, base: String, out: String,
                        copies: Int = 10): Unit = {
    val outDir = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(outDir.resolve("events.parquet"))) return
    java.nio.file.Files.createDirectories(outDir)
    val ev = graft.operators.Tables.events(s, base)
    val uShift = ev.agg(max("user_id")).head().getLong(0) + 1
    val rest = ev.columns.filter(_ != "user_id").map(col).toSeq
    (0 until copies).map { k =>
      ev.select((col("user_id") + lit(k * uShift)).as("user_id") +: rest: _*)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val docs = graft.operators.Tables.documents(s, base)
    (0 until copies).map { k =>
      docs.select((col("doc_id") * copies + lit(k)).as("doc_id"),
        expr(s"translate(text, '${graft.operators.Dedup.caesarFrom}', " +
          s"'${graft.operators.Dedup.caesarTo(k)}')").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  case class Sample(chunk: Int, fed: Long, stateRows: Long, stateMB: Double,
                    wallS: Double)

  private val runIds = new java.util.concurrent.atomic.AtomicLong(0L)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(p.toFile)
  }

  /** Chunked feed through a memory-sink streaming query: write chunk k's
    * rows as one parquet file, processAllAvailable, sample the LAST
    * progress carrying state info. Wall counts only stream processing,
    * not the spool writes. `chunked` must carry a `chunk` column
    * (1..chunks) plus exactly the columns of `schema`. */
  private def feed(s: SparkSession, label: String, chunked: DataFrame,
                   chunks: Int, schema: StructType,
                   toTs: DataFrame => DataFrame,
                   build: DataFrame => DataFrame): Seq[Sample] = {
    val runId = runIds.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-sscale-$label-$runId")
    val name = s"graft_sscale_${label}_$runId"
    val cols = schema.fields.map(f => col(f.name)).toSeq
    val stream = toTs(s.readStream.schema(schema).parquet(tmp.toString))
    val q = build(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val out = try {
      var fed = 0L
      (1 to chunks).map { k =>
        val rows = chunked.filter(col("chunk") === k).select(cols: _*)
        rows.coalesce(1).write.mode("append").parquet(tmp.toString)
        fed += rows.count()
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        val p = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        val stateRows = p.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        val stateMem = p.map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(-1L)
        Sample(k, fed, stateRows, stateMem / 1048576.0, wall)
      }
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
      deleteRecursively(tmp)
    }
    out
  }

  /** Run one (op, mult, dir) cell in a FRESH child JVM and return its
    * per-chunk samples, or Nil on timeout/failure. Same rationale as
    * [[ScaleProbe]]'s spawnCell: the r12 in-process three-point probe
    * read false super-linear legs from same-JVM pressure; exponents are
    * only honest when every cell pays identical fixed costs. Streaming
    * cells are single-execution (wall already sums 5 chunked feeds),
    * matching the in-process mode's sampling. */
  private def spawnStreamCell(op: String, mult: Int, dir: String,
                              timeoutSec: Long = 1800): Seq[Sample] = {
    import scala.jdk.CollectionConverters._
    ChildJvm.runForLine("graft.tools.StreamScaleProbe",
      env = Map("SPARK_GRAFT_SSCALE_CELL" -> s"$op:$mult:$dir"),
      dropEnv = Seq("SPARK_GRAFT_SCALE_STANDALONE"),
      marker = "\"sscale_cell\"", timeoutSec = timeoutSec,
      cwd = Some(new java.io.File(sys.props("user.dir"))))
      // Try: malformed child output degrades to the Nil sentinel
      // instead of aborting the whole probe run (ADVICE r12)
      .flatMap { line => scala.util.Try {
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
        root.path("samples").elements().asScala.map { s =>
          Sample(s.path("chunk").asInt(), s.path("fed").asLong(),
            s.path("stateRows").asLong(), s.path("stateMB").asDouble(),
            s.path("wallS").asDouble())
        }.toSeq
      }.toOption }.getOrElse(Nil)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALE_STREAM_DIR",
      "target/scale10stream")
    // Copy counts beyond 1x; "10,20" adds the asymptotic leg where the
    // fixed costs that flatter 1x->10x have amortized (same rationale as
    // ScaleProbe's three-point mode).
    val points = sys.env.getOrElse("SPARK_GRAFT_SCALE_STREAM_POINTS", "10")
      .split(",").map(_.trim.toInt).toSeq
    val chunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "5").toInt
    val lateness = "10 minutes" // production horizon: eviction is LIVE
    // Child-cell protocol: "<op>:<mult>:<dir>" — run exactly one cell,
    // print one JSON line, exit (see [[spawnStreamCell]]).
    val cell = sys.env.get("SPARK_GRAFT_SSCALE_CELL")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val scaleDirs: Seq[(Int, String)] = if (cell.nonEmpty) Nil else
      points.map { k =>
        val out = if (k == 10) scaled else s"target/scale${k}stream"
        buildScaledStream(spark, base, out, k)
        k -> out
      }

    val evSchema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType)))
    def eventsChunked(dir: String): DataFrame =
      graft.operators.Tables.events(spark, dir)
        .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"))
        .withColumn("chunk", ntile(chunks).over(Window.orderBy("ts")))
        .localCheckpoint()
    val evToTs = (df: DataFrame) =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // the anomaly op keys on event_type, not user_id — own feeder/schema
    val evTypeSchema = StructType(Seq(
      StructField("ts", LongType), StructField("event_type", StringType)))
    def eventsChunkedTyped(dir: String): DataFrame =
      graft.operators.Tables.events(spark, dir)
        .select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_type"))
        .withColumn("chunk", ntile(chunks).over(Window.orderBy("ts")))
        .localCheckpoint()

    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts_ms", LongType)))
    def docsChunked(dir: String, docLimit: Long): DataFrame = {
      val docs = graft.operators.Tables.documents(spark, dir)
        .filter(col("doc_id") < docLimit).select(col("doc_id"), col("text"))
      val n = docs.count()
      val spanMs = chunks * 20L * 60000L // 20 min per chunk, 2x the horizon
      docs.withColumn("rk", row_number().over(Window.orderBy("doc_id")) - 1)
        .withColumn("ts_ms",
          lit(86400000L) + (col("rk") * (spanMs.toDouble / n)).cast("long"))
        .withColumn("chunk", (col("rk") * chunks / n).cast("int") + 1)
        .select("doc_id", "text", "ts_ms", "chunk")
        .localCheckpoint()
    }
    val docToTs = (df: DataFrame) =>
      df.withColumn("ts", timestamp_millis(col("ts_ms")))

    val A = graft.streaming.StreamingAnalytics
    // (op label, per-scale feeder)
    val ops: Seq[(String, (String, Int) => Seq[Sample])] = Seq(
      "stream_distinct" -> ((dir: String, mult: Int) =>
        feed(spark, s"dist$mult", eventsChunked(dir), chunks, evSchema, evToTs,
          df => A.windowedDistinctUsers(df, lateness = lateness))),
      "stream_hll" -> ((dir: String, mult: Int) =>
        feed(spark, s"hll$mult", eventsChunked(dir), chunks, evSchema, evToTs,
          df => A.windowedApproxDistinctUsers(df, lateness = lateness))),
      "stream_dedup" -> ((dir: String, mult: Int) =>
        feed(spark, s"dedup$mult", docsChunked(dir, Long.MaxValue), chunks,
          docSchema, docToTs,
          df => A.dedupStream(df.select(col("doc_id"), col("ts"), col("text")),
            lateness = lateness))),
      // neardup over the registered row's 2000-doc working set, 10x'd by
      // the interleaved ids (20000 scaled ids = 2000 base docs x 10 copies)
      "stream_neardup" -> ((dir: String, mult: Int) =>
        feed(spark, s"ndup$mult", docsChunked(dir, 2000L * mult), chunks,
          docSchema, docToTs,
          df => A.nearDupStream(
            df.select(col("doc_id"), col("ts"), col("text")),
            lateness = lateness).toDF())),
      // the spike monitor's streaming half (r13 brief #5): state is the
      // live per-(window, type) counter set — must stay flat per chunk
      // under watermark eviction like the other windowed aggs
      "stream_anomaly" -> ((dir: String, mult: Int) =>
        feed(spark, s"anom$mult", eventsChunkedTyped(dir), chunks,
          evTypeSchema, evToTs,
          df => A.anomalyWindowCounts(df, lateness = lateness))))

    def ms(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    cell.foreach { spec =>
      val Array(op, multS, dir) = spec.split(":", 3)
      val samples = ops.toMap.apply(op)(dir, multS.toInt)
      val sJson = samples.map(x =>
        s"""{"chunk":${x.chunk},"fed":${x.fed},"stateRows":${x.stateRows},""" +
          s""""stateMB":${ms(x.stateMB)},"wallS":${ms(x.wallS)}}""").mkString(",")
      println(s"""{"sscale_cell":"$op","mult":$multS,"samples":[$sJson]}""")
      spark.stop()
      return
    }

    val standalone =
      sys.env.get("SPARK_GRAFT_SCALE_STANDALONE").exists(_.nonEmpty)
    val allScales: Seq[(Int, String)] = (1, base) +: scaleDirs
    // SPARK_GRAFT_SSCALE_OPS=<csv>: restrict to named ops (a one-op
    // probe doesn't pay for the other four; ScaleProbe's OPS precedent)
    val onlyOps = sys.env.get("SPARK_GRAFT_SSCALE_OPS")
      .map(_.split(",").map(_.trim).toSet)
    // (op, per-scale samples, per-leg exponents)
    val results = ops.filter { case (n, _) => onlyOps.forall(_.contains(n)) }
      .map { case (opName, run) =>
      val perScale = allScales.map { case (k, dir) =>
        k -> (if (standalone) spawnStreamCell(opName, k, dir) else run(dir, k)) }
      val legs = perScale.sliding(2).collect { case Seq((ka, sa), (kb, sb)) =>
        math.log(sb.map(_.wallS).sum / sa.map(_.wallS).sum) /
          math.log(kb.toDouble / ka)
      }.toSeq
      System.err.println(f"[sscale] $opName%-16s " +
        perScale.map { case (k, ss) => f"${k}x ${ss.map(_.wallS).sum}%7.2f s" }
          .mkString("  ") +
        "  exp " + legs.map(e => f"$e%5.2f").mkString(" -> ") +
        s"  evicted-state rows final " +
        perScale.map(_._2.last.stateRows).mkString(" -> "))
      (opName, perScale, legs)
    }

    println("## per-chunk state under eviction (lateness 10 minutes)")
    println("| op | scale | " + (1 to chunks).map(k => s"c$k rows").mkString(" | ") +
      " | " + (1 to chunks).map(k => s"c$k MB").mkString(" | ") + " |")
    println("|---" * (2 + 2 * chunks) + "|")
    results.foreach { case (n, perScale, _) =>
      perScale.foreach { case (k, ss) =>
        println(s"| $n | ${k}x | " + ss.map(_.stateRows).mkString(" | ") +
          " | " + ss.map(x => f"${x.stateMB}%.2f").mkString(" | ") + " |")
      }
    }
    println("## wall (stream processing only, chunked feed)")
    println("| op | " + allScales.map(s => s"${s._1}x (s)").mkString(" | ") +
      " | " + allScales.sliding(2).map { case Seq(a, b) =>
        s"exp ${a._1}->${b._1}" }.mkString(" | ") + " |")
    println("|---" * (allScales.size * 2) + "|")
    results.foreach { case (n, perScale, legs) =>
      println(s"| $n | " + perScale.map(p => f"${p._2.map(_.wallS).sum}%.2f")
        .mkString(" | ") + " | " + legs.map(e => f"$e%.2f").mkString(" | ") + " |")
    }
    val json = results.map { case (n, perScale, legs) =>
      s""""$n":{""" + perScale.map { case (k, ss) =>
        s""""wall_${k}x":${ms(ss.map(_.wallS).sum)},""" +
          s""""state_rows_${k}x":[${ss.map(_.stateRows).mkString(",")}],""" +
          s""""state_mb_${k}x":[${ss.map(x => ms(x.stateMB)).mkString(",")}]"""
      }.mkString(",") + s""","exp":[${legs.map(ms).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_scale_probe","chunks":$chunks,"lateness":"$lateness","points":[${allScales.map(_._1).mkString(",")}],"rows":$json}""")
    spark.stop()
  }
}
