package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.model.TargetConfig
import graft.pipeline.SingerPipeline
import graft.streaming.{StdinSpooler, StreamingIngest}
import graft.sources.S3Conf

/** CLI entry point with the reference's UX (reference __init__.py:334-358,
  * setup.py:39-42): read newline-delimited Singer messages from stdin (or
  * `--input file` for testing), `--config config.json` with the same keys,
  * write per-stream Parquet to the bucket/prefix, emit the final state
  * bookmark to stdout.
  *
  * Two consumption modes:
  *  - `--mode batch` (default): spool all of stdin, then one batch job —
  *    right for bounded extracts and for pointing `--input` at a landing
  *    zone.
  *  - `--mode stream`: LIVE consumption of an unbounded pipe — stdin is
  *    chunk-spooled into a watch directory ([[StdinSpooler]]) while a
  *    Structured Streaming query ([[StreamingIngest]]) appends per-stream
  *    parquet and emits a state bookmark after every committed micro-batch,
  *    long before EOF. This matches the reference's incremental loop
  *    (__init__.py:215) and adds crash-resume via the file-source
  *    checkpoint. With `--input <dir>` the directory itself is watched and
  *    stdin is not read.
  *  - `--mode live`: the same incremental loop with NO spool files — raw
  *    stdin through the DSv2 micro-batch source
  *    ([[graft.streaming.StdinStreamProvider]]). Zero-copy, but a pipe
  *    cannot replay across a process restart (the source refuses a gap
  *    rather than hiding it); crash-durable deployments use
  *    `--mode stream`.
  *
  * Divergences (documented, SURVEY.md §7.4): `--output` allows a local/
  * hdfs URI instead of S3 (the reference requires a bucket); compression
  * actually compresses; zero-record input does not crash.
  *
  * Usage: some-tap | sbt "runMain graft.Main --config config.json"
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

    val config: TargetConfig = opts.get("config") match {
      case Some(path) =>
        val node = graft.model.Singer.parseJson(Files.readString(Paths.get(path)))
        val m = node.properties().iterator()
        val builder = scala.collection.mutable.Map.empty[String, String]
        while (m.hasNext) { val e = m.next(); builder(e.getKey) = e.getValue.asText() }
        TargetConfig.fromMap(builder.toMap)
      case None => TargetConfig()
    }

    val output = opts.get("output") match {
      case Some(uri) => uri
      case None =>
        val errs = TargetConfig.validate(
          config.s3Bucket.map(b => Map[String, Any]("s3_bucket" -> b)).getOrElse(Map.empty))
        if (errs.nonEmpty) { errs.foreach(System.err.println); sys.exit(1) }
        S3Conf.outputUri(config)
    }

    var builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-target")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // L7 temp_dir (reference __init__.py:46-50,91): shuffle/spill scratch
    // space follows the configured staging directory too.
    config.tempDir.foreach(d => builder = builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    S3Conf(spark, config)

    try {
      opts.getOrElse("mode", "batch") match {
        case "stream" => runStream(spark, opts, output, config)
        case "live"   => runLive(spark, opts, output, config)
        case _        => runBatch(spark, opts, output, config)
      }
    } finally spark.stop()
  }

  /** Spool/staging root: `temp_dir` from config (L7) or the system default. */
  private def tempRoot(config: TargetConfig): Option[java.nio.file.Path] =
    config.tempDir.map { d =>
      val p = Paths.get(d)
      Files.createDirectories(p)
      p
    }

  /** Batch mode: spool stdin to a file so the input is splittable/
    * re-scannable (the batch pipeline makes several passes; a 100 TB
    * deployment points --input at the durable landing zone instead). */
  private def runBatch(spark: SparkSession, opts: Map[String, String],
                       output: String, config: TargetConfig): Unit = {
    val input = opts.get("input") match {
      case Some(p) => p
      case None =>
        val tmp = tempRoot(config) match {
          case Some(root) => Files.createTempFile(root, "singer-stdin", ".jsonl")
          case None => Files.createTempFile("singer-stdin", ".jsonl")
        }
        Files.copy(System.in, tmp, StandardCopyOption.REPLACE_EXISTING)
        if (Files.size(tmp) == 0L)
          System.err.println("[graft] warning: 0 bytes read from stdin — " +
            "is the tap connected? (zero-message input is not an error)")
        tmp.toString
    }
    val result = SingerPipeline.run(spark, input, output, config)
    result.outputs.foreach(o =>
      System.err.println(s"[graft] wrote ${o.rows} rows -> ${o.path}"))
    SingerPipeline.emitState(result.state)
  }

  /** Live mode: raw stdin through the DSv2 source — no spool directory,
    * no chunk files; per-trigger parquet + bookmarks while the tap
    * produces. The checkpoint is per-run by default: a pipe cannot be
    * re-read after a crash, so resuming an old checkpoint would only
    * trip the source's evicted-offset guard. */
  private def runLive(spark: SparkSession, opts: Map[String, String],
                      output: String, config: TargetConfig): Unit = {
    val checkpoint = opts.getOrElse("checkpoint", (tempRoot(config) match {
      case Some(root) => Files.createTempDirectory(root, "graft-live-ckpt")
      case None => Files.createTempDirectory("graft-live-ckpt")
    }).toString)
    val ingest = new StreamingIngest(spark, output, config)
    val query = ingest.startLive(checkpoint, Trigger.ProcessingTime("500 milliseconds"))
    // Same wait discipline as the spooled path: EOF *or* query death.
    while (!graft.streaming.StdinStream.eofReached && query.isActive)
      query.awaitTermination(500)
    if (query.isActive) {
      query.processAllAvailable() // tap closed the pipe: drain the buffer
      query.stop()
    } else query.awaitTermination() // died: surface the real failure
  }

  /** Stream mode: consume the pipe incrementally — parquet and bookmarks
    * appear per micro-batch while the tap is still producing. */
  private def runStream(spark: SparkSession, opts: Map[String, String],
                        output: String, config: TargetConfig): Unit = {
    def tmpDir(prefix: String): java.nio.file.Path = tempRoot(config) match {
      case Some(root) => Files.createTempDirectory(root, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    val (watchDir, spooler) = opts.get("input") match {
      case Some(dir) => (dir, None) // watch an existing landing directory
      case None =>
        val d = tmpDir("graft-stdin-spool")
        // file_size is the OUTPUT records-per-file knob; reused here only
        // as a rough spool granularity hint, clamped into int range (an
        // unchecked .toInt of a >2^31 Long flips negative and crashes the
        // spooler's require at launch).
        val spoolLines =
          if (config.fileSize > 0) config.fileSize.min(1000000L).toInt else 10000
        val s = new StdinSpooler(System.in, d, maxLines = spoolLines).start()
        (d.toString, Some(s))
    }
    // Watch-dir mode defaults to a STABLE checkpoint under the output so a
    // re-run after a crash resumes instead of re-ingesting every landing
    // file into the append-mode output (duplicating all rows). Stdin-spool
    // mode keeps a per-run checkpoint: its spool dir is per-run and a pipe
    // is not replayable across process restarts anyway.
    val checkpoint = opts.getOrElse("checkpoint",
      if (spooler.isEmpty) s"$output/_graft_checkpoint"
      else tmpDir("graft-stdin-ckpt").toString)
    val ingest = new StreamingIngest(spark, output, config)
    val query = ingest.start(watchDir, checkpoint,
      Trigger.ProcessingTime("500 milliseconds"))
    spooler match {
      case Some(s) =>
        // Wait for EOF *or* query death — blocking on EOF alone hangs the
        // process forever when the query fails mid-pipe (and the tap keeps
        // producing). awaitTermination throws the streaming error.
        while (!s.eofReached && query.isActive)
          query.awaitTermination(500)
        if (query.isActive) {
          query.processAllAvailable()  // tap closed the pipe: drain chunks
          query.stop()
        } else query.awaitTermination() // died: surface the real failure
        s.rethrowIfFailed()
      case None => query.awaitTermination()
    }
  }
}
