package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.model.TargetConfig

class StreamingIngestSpec extends SparkSpec {

  private val schemaLine =
    """{"type": "SCHEMA", "stream": "s1", "schema": {"properties": {
      |"pk": {"type": ["null", "integer"]},
      |"v": {"maxLength": 8, "type": ["null", "string"]}}, "type": "object"},
      |"key_properties": ["pk"]}""".stripMargin.replace("\n", " ")

  test("streaming ingest: micro-batches append per-stream parquet; registry persists across batches") {
    val in = Files.createTempDirectory("stream-in")
    val out = Files.createTempDirectory("stream-out").toString
    val cp = Files.createTempDirectory("stream-cp").toString
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(streamsInSeparateFolder = true))

    // batch 1: schema + 2 records + trailing state
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a"}}""",
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 2, "v": "b"}}""",
      """{"type": "STATE", "value": {"bookmarks": {"s1": 2}}}""").mkString("\n"))
    val q1 = ingest.start(in.toString, cp)
    q1.awaitTermination()
    assert(spark.read.parquet(s"$out/s1").count() == 2)
    assert(ingest.emittedState.contains("""{"bookmarks":{"s1":2}}"""))

    // batch 2: records only — schema registry must persist, state resets
    Files.writeString(in.resolve("b2.jsonl"),
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 3, "v": "c"}}""")
    val q2 = ingest.start(in.toString, cp)
    q2.awaitTermination()
    assert(spark.read.parquet(s"$out/s1").count() == 3)
    assert(ingest.emittedState.isEmpty) // P8: record after last STATE
  }

  test("streaming: SCHEMA after its RECORD in one batch fails (in-batch order check)") {
    val in = Files.createTempDirectory("stream-in3")
    val out = Files.createTempDirectory("stream-out3").toString
    val cp = Files.createTempDirectory("stream-cp3").toString
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a"}}""",
      schemaLine).mkString("\n"))
    val ingest = new StreamingIngest(spark, out, TargetConfig())
    val q = ingest.start(in.toString, cp)
    val e = intercept[Exception] { q.awaitTermination() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(
      _.contains("A record for stream s1 was encountered before a corresponding schema")))

    // Crash-resume retry of the SAME batch must fail IDENTICALLY: the
    // failing attempt must not have persisted the batch's SCHEMA (else
    // the retry finds it registered, skips the order check, and the
    // protocol error silently vanishes).
    val ingest2 = new StreamingIngest(spark, out, TargetConfig())
    val q2 = ingest2.start(in.toString, cp)
    val e2 = intercept[Exception] { q2.awaitTermination() }
    assert(messages(e2).exists(
      _.contains("A record for stream s1 was encountered before a corresponding schema")))
  }

  test("streaming: re-emitted SCHEMA reshapes records, in-batch and across batches") {
    val in = Files.createTempDirectory("stream-in4")
    val out = Files.createTempDirectory("stream-out4").toString
    val cp = Files.createTempDirectory("stream-cp4").toString
    val v2 =
      """{"type": "SCHEMA", "stream": "s1", "schema": {"properties": {
        |"pk": {"type": ["null", "integer"]},
        |"v": {"maxLength": 8, "type": ["null", "string"]},
        |"v_new": {"type": ["null", "string"]}}, "type": "object"},
        |"key_properties": ["pk"]}""".stripMargin.replace("\n", " ")
    // inferExtraFields off: this test pins the declared-schema reshaping
    // (record 1's v_new is DROPPED because v1 doesn't declare it) — §1.4
    // passthrough would keep it; that behavior has its own test below.
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(streamsInSeparateFolder = true, inferExtraFields = false))

    // batch 1: v1 record, then an in-batch re-emit to v2 and a v2 record
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a", "v_new": "dropped"}}""",
      v2,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 2, "v": "b", "v_new": "kept"}}""").mkString("\n"))
    ingest.start(in.toString, cp).awaitTermination()
    // batch 2: registry must now hold v2 (last wins), shaping this record
    Files.writeString(in.resolve("b2.jsonl"),
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 3, "v": "c", "v_new": "persisted"}}""")
    ingest.start(in.toString, cp).awaitTermination()

    val df = spark.read.option("mergeSchema", "true").parquet(s"$out/s1")
    val byPk = df.collect().map(r => r.getAs[Long]("pk") -> r.getAs[String]("v_new")).toMap
    assert(byPk == Map(1L -> null, 2L -> "kept", 3L -> "persisted"))
  }

  test("streaming: metadata columns added when configured (L1 parity with batch)") {
    val in = Files.createTempDirectory("stream-in5")
    val out = Files.createTempDirectory("stream-out5").toString
    val cp = Files.createTempDirectory("stream-cp5").toString
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(streamsInSeparateFolder = true, addMetadataColumns = true),
      clock = () => "20260101_000000-000000")
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a"}, "time_extracted": "2026-01-01T00:00:00Z"}""").mkString("\n"))
    ingest.start(in.toString, cp).awaitTermination()
    val row = spark.read.parquet(s"$out/s1").collect().head
    assert(row.getAs[String]("_sdc_extracted_at") == "2026-01-01T00:00:00Z")
    assert(row.getAs[String]("_sdc_batched_at") == "20260101_000000-000000")
  }

  test("streaming: extra record fields survive when infer_extra_fields (§1.4 parity)") {
    val in = Files.createTempDirectory("stream-in6")
    val out = Files.createTempDirectory("stream-out6").toString
    val cp = Files.createTempDirectory("stream-cp6").toString
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(streamsInSeparateFolder = true)) // inferExtraFields defaults true
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a", "undeclared": "kept"}}""").mkString("\n"))
    ingest.start(in.toString, cp).awaitTermination()
    val row = spark.read.parquet(s"$out/s1").collect().head
    assert(row.getAs[String]("undeclared") == "kept")
  }

  test("streaming: infer_sample_rows bounds the inference scan (documented trade)") {
    val in = Files.createTempDirectory("stream-in8")
    val out = Files.createTempDirectory("stream-out8").toString
    val cp = Files.createTempDirectory("stream-cp8").toString
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(streamsInSeparateFolder = true, inferSampleRows = 1L))
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a", "early": "seen"}}""",
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 2, "v": "b", "late": "missed"}}""").mkString("\n"))
    ingest.start(in.toString, cp).awaitTermination()
    val df = spark.read.parquet(s"$out/s1")
    // field in the sampled prefix passes through; one past the bound does not
    assert(df.columns.contains("early") && !df.columns.contains("late"))
    assert(df.count() == 2) // declared fields of ALL records still written
  }

  test("streaming: RECORD without a 'record' key is a Singer protocol error") {
    val in = Files.createTempDirectory("stream-in9")
    val out = Files.createTempDirectory("stream-out9").toString
    val cp = Files.createTempDirectory("stream-cp9").toString
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1"}""").mkString("\n"))
    val ingest = new StreamingIngest(spark, out, TargetConfig())
    val q = ingest.start(in.toString, cp)
    val e = intercept[Exception] { q.awaitTermination() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("Message is missing required key 'record'")))
  }

  test("streaming: naming_convention + s3_key_prefix shape the output key (S8/L3 parity)") {
    val in = Files.createTempDirectory("stream-in7")
    val out = Files.createTempDirectory("stream-out7").toString
    val cp = Files.createTempDirectory("stream-cp7").toString
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(s3KeyPrefix = "pfx-",
        namingConvention = Some("exports/{stream}-{date}.parquet")),
      clock = () => "20260101_000000-000000")
    Files.writeString(in.resolve("b1.jsonl"), Seq(
      schemaLine,
      """{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a"}}""").mkString("\n"))
    ingest.start(in.toString, cp).awaitTermination()
    // prefix inserted after the template's last '/', same pin as NamingSpec
    val expected = s"$out/exports/pfx-s1-20260101.parquet"
    assert(spark.read.parquet(expected).count() == 1)
  }

  test("live stdin DSv2 source: unbounded pipe, incremental micro-batches, spool-path parity") {
    val out = Files.createTempDirectory("live-out").toString
    val cp = Files.createTempDirectory("live-cp").toString
    val pipeIn = new java.io.PipedInputStream(1 << 16)
    val writer = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(new java.io.PipedOutputStream(pipeIn),
        java.nio.charset.StandardCharsets.UTF_8), true)
    StdinStream.inputFactory = () => pipeIn
    try {
      val ingest = new StreamingIngest(spark, out,
        TargetConfig(streamsInSeparateFolder = true))
      val q = ingest.startLive(cp)
      def settle(cond: => Boolean): Unit = {
        val end = System.currentTimeMillis + 30000
        while (!cond && System.currentTimeMillis < end) {
          q.processAllAvailable(); Thread.sleep(50)
        }
        assert(cond)
      }
      // wave 1: schema + 2 records, while the pipe stays OPEN — the
      // spooler path can only do this with a chunk flush; the DSv2
      // source batches whatever has arrived.
      writer.println(schemaLine)
      writer.println("""{"type": "RECORD", "stream": "s1", "record": {"pk": 1, "v": "a"}}""")
      writer.println("""{"type": "RECORD", "stream": "s1", "record": {"pk": 2, "v": "b"}}""")
      settle(new java.io.File(s"$out/s1").exists &&
        spark.read.parquet(s"$out/s1").count() == 2)
      // wave 2: a LATER record + trailing state — a genuinely
      // incremental micro-batch against the same registry.
      writer.println("""{"type": "RECORD", "stream": "s1", "record": {"pk": 3, "v": "c"}}""")
      writer.println("""{"type": "STATE", "value": {"bookmarks": {"s1": 3}}}""")
      settle(spark.read.parquet(s"$out/s1").count() == 3 &&
        ingest.emittedState.contains("""{"bookmarks":{"s1":3}}"""))
      q.stop()
      // Same rows the file-spool path would land (StreamingIngest's core
      // is shared; this pins the new source end to end).
      val pks = spark.read.parquet(s"$out/s1").collect()
        .map(r => r.getAs[Long]("pk")).sorted.toSeq
      assert(pks == Seq(1L, 2L, 3L))
    } finally {
      StdinStream.inputFactory = () => System.in
      writer.close()
    }
  }

  test("streaming: record for unknown stream fails the batch") {
    val in = Files.createTempDirectory("stream-in2")
    val out = Files.createTempDirectory("stream-out2").toString
    val cp = Files.createTempDirectory("stream-cp2").toString
    Files.writeString(in.resolve("b1.jsonl"),
      """{"type": "RECORD", "stream": "nope", "record": {"pk": 1}}""")
    val ingest = new StreamingIngest(spark, out, TargetConfig())
    val q = ingest.start(in.toString, cp)
    val e = intercept[Exception] { q.awaitTermination() }
    assert(e.getMessage.contains("nope") ||
      Option(e.getCause).exists(_.getMessage.contains("nope")))
  }
}
