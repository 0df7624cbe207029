package graft.pipeline

import java.nio.file.Files
import graft.SparkSpec
import graft.model.TargetConfig

/** Golden end-to-end pipeline spec, replicating the *shape* of the
  * reference's three-stream corpus (FIXTURES.md §1) with real read-back
  * assertions — the reference's own output assertion is a stub
  * (tests/integration/test_target_s3_parquet.py:36-39). */
class SingerPipelineSpec extends SparkSpec {

  private val intSchema =
    """{"minimum": -2147483648, "maximum": 2147483647, "type": ["null", "integer"]}"""
  private def schemaMsg(stream: String, extra: String = "") =
    s"""{"type": "SCHEMA", "stream": "$stream", "schema": {"properties": {
       |"pk": $intSchema, "v_str": {"maxLength": 16, "type": ["null", "string"]},
       |"v_int": $intSchema$extra}, "type": "object"}, "key_properties": ["pk"]}"""
      .stripMargin.replace("\n", " ")

  private val corpus: Seq[String] = Seq(
    """{"type": "STATE", "value": {"currently_syncing": "alpha"}}""",
    schemaMsg("alpha"),
    """{"type": "ACTIVATE_VERSION", "stream": "alpha", "version": 1}""",
    """{"type": "RECORD", "stream": "alpha", "record": {"pk": 1, "v_str": "1", "v_int": 1}, "version": 1, "time_extracted": "2024-05-01T00:00:00.000000Z"}""",
    schemaMsg("beta", """, "v_date": {"format": "date-time", "type": ["null", "string"]}"""),
    """{"type": "RECORD", "stream": "beta", "record": {"pk": 1, "v_str": "a", "v_int": 5, "v_date": "2019-02-01T15:12:45.000000Z", "_sdc_deleted_at": "2019-02-12T01:10:10.000000Z"}}""",
    """{"type": "RECORD", "stream": "beta", "record": {"pk": 2, "v_str": "b", "v_int": 6, "v_date": "2019-02-10T02:00:00.000000Z"}}""",
    schemaMsg("gamma",
      """, "nest": {"type": ["null", "object"], "properties": {
        |"inner": {"type": ["null", "integer"]},
        |"tags": {"type": ["null", "array"], "items": {"type": ["null", "string"]}}}}"""
        .stripMargin.replace("\n", " ")),
    """{"type": "RECORD", "stream": "gamma", "record": {"pk": 10, "v_str": "x", "v_int": 7, "nest": {"inner": 3, "tags": ["10", "11"]}}}""",
    """{"type": "STATE", "value": {"currently_syncing": null, "bookmarks": {"alpha": {"done": true}}}}""",
  )

  private def writeCorpus(lines: Seq[String]): String = {
    val f = Files.createTempFile("corpus", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }
  private def outDir(): String = Files.createTempDirectory("graft-out").toString

  test("three-stream golden run: content, flatten, passthrough, state") {
    val out = outDir()
    val res = SingerPipeline.run(spark, writeCorpus(corpus), out,
      TargetConfig(), clock = () => "T0")

    assert(res.outputs.map(_.stream) == Seq("alpha", "beta", "gamma"))
    assert(res.keyProperties("alpha") == Seq("pk"))

    val alpha = spark.read.parquet(s"$out/alpha-T0.parquet")
    assert(alpha.columns.toSeq == Seq("pk", "v_str", "v_int"))
    assert(alpha.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "1", 1L)))

    // _sdc_deleted_at is in no schema but must survive (union-schema §1.4)
    val beta = spark.read.parquet(s"$out/beta-T0.parquet")
    assert(beta.columns.contains("_sdc_deleted_at"))
    val byPk = beta.collect().map(r => r.getAs[Long]("pk") -> r.getAs[String]("_sdc_deleted_at")).toMap
    assert(byPk(1L) == "2019-02-12T01:10:10.000000Z" && byPk(2L) == null)

    // nested flatten with __ names; array rendered as Python repr
    val gamma = spark.read.parquet(s"$out/gamma-T0.parquet")
    assert(gamma.columns.toSeq.contains("nest__inner") && gamma.columns.toSeq.contains("nest__tags"))
    val g = gamma.collect().head
    assert(g.getAs[Long]("nest__inner") == 3L)
    assert(g.getAs[String]("nest__tags") == "['10', '11']")

    // final STATE follows all records -> emitted (P8)
    assert(res.state.exists(_.contains("\"bookmarks\"")))
  }

  test("unknown-type messages are echoed to stderr like the reference (L6)") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(buf, true, "UTF-8")) {
      SingerPipeline.run(spark, writeCorpus(corpus), outDir(),
        TargetConfig(), clock = () => "T0")
    }
    val err = buf.toString("UTF-8")
    // per-message echo carries the type AND the payload (__init__.py:246-251)
    assert(err.contains("Unknown message type ACTIVATE_VERSION"))
    assert(err.contains(""""version": 1"""))
  }

  test("unknown-type echo is capped; exact total still reported") {
    val many = Seq(schemaMsg("alpha")) ++
      (1 to 8).map(i => s"""{"type": "BOGUS_TYPE", "stream": "alpha", "n": $i}""") ++
      Seq("""{"type": "RECORD", "stream": "alpha", "record": {"pk": 1, "v_str": "s", "v_int": 2}}""")
    val buf = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(buf, true, "UTF-8")) {
      SingerPipeline.run(spark, writeCorpus(many), outDir(),
        TargetConfig(), clock = () => "T0")
    }
    val err = buf.toString("UTF-8")
    val echoed = err.linesIterator.count(_.contains("Unknown message type BOGUS_TYPE"))
    assert(echoed == SingerPipeline.unknownSampleN)
    assert(err.contains(s"8 unknown-type message(s) total; first ${SingerPipeline.unknownSampleN} shown"))
    // the first-in-file-order sample, not an arbitrary subset
    assert(err.contains(""""n": 1"""))
  }

  test("state resets to None when a RECORD follows the last STATE (P8)") {
    val lines = Seq(
      """{"type": "STATE", "value": {"bookmarks": {"alpha": 1}}}""",
      schemaMsg("alpha"),
      """{"type": "RECORD", "stream": "alpha", "record": {"pk": 1, "v_str": "s", "v_int": 2}}""")
    val res = SingerPipeline.run(spark, writeCorpus(lines), outDir(),
      TargetConfig(), clock = () => "T0")
    assert(res.state.isEmpty)
  }

  test("invalid JSON line fails with the reference's message") {
    val lines = Seq(schemaMsg("alpha"), "THIS IS NOT JSON")
    val e = intercept[RuntimeException] {
      SingerPipeline.run(spark, writeCorpus(lines), outDir(), TargetConfig())
    }
    assert(e.getMessage.startsWith("Unable to parse:"))
  }

  test("record before schema fails with the reference's message") {
    val lines = Seq(
      schemaMsg("alpha"),
      """{"type": "RECORD", "stream": "beta", "record": {"pk": 1}}""")
    val e = intercept[IllegalArgumentException] {
      SingerPipeline.run(spark, writeCorpus(lines), outDir(), TargetConfig())
    }
    assert(e.getMessage ==
      "A record for stream beta was encountered before a corresponding schema")
  }

  test("constraint violation aborts in strict mode (Draft4 subset)") {
    val lines = Seq(
      schemaMsg("alpha"),
      """{"type": "RECORD", "stream": "alpha", "record": {"pk": 1, "v_str": "this string is far too long for maxLength", "v_int": 1}}""")
    val e = intercept[IllegalArgumentException] {
      SingerPipeline.run(spark, writeCorpus(lines), outDir(), TargetConfig())
    }
    assert(e.getMessage.contains("v_str") && e.getMessage.contains("too long"))
  }

  test("inline validation aborts on violation during the write pass") {
    val lines = Seq(
      schemaMsg("alpha"),
      """{"type": "RECORD", "stream": "alpha", "record": {"pk": 1, "v_str": "this string is far too long for maxLength", "v_int": 1}}""")
    val e = intercept[Exception] {
      SingerPipeline.run(spark, writeCorpus(lines), outDir(),
        TargetConfig(inlineValidation = true))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("v_str") && m.contains("too long")))
  }

  test("inline validation passes clean data through unchanged") {
    val out = outDir()
    SingerPipeline.run(spark, writeCorpus(corpus), out,
      TargetConfig(inlineValidation = true), clock = () => "TI")
    assert(spark.read.parquet(s"$out/beta-TI.parquet").count() == 2)
  }

  test("type violation detected (string where integer declared)") {
    val lines = Seq(
      schemaMsg("alpha"),
      """{"type": "RECORD", "stream": "alpha", "record": {"pk": "not-an-int", "v_str": "s", "v_int": 1}}""")
    val e = intercept[IllegalArgumentException] {
      SingerPipeline.run(spark, writeCorpus(lines), outDir(), TargetConfig())
    }
    assert(e.getMessage.contains("pk"))
  }

  test("zero-record run emits last state and writes nothing (fixes X4 crash)") {
    val lines = Seq(schemaMsg("alpha"),
      """{"type": "STATE", "value": {"done": true}}""")
    val res = SingerPipeline.run(spark, writeCorpus(lines), outDir(), TargetConfig())
    assert(res.outputs.isEmpty && res.state.contains("""{"done":true}"""))
  }

  test("gzip compression actually compresses (fixes S9) and names the key") {
    val out = outDir()
    val res = SingerPipeline.run(spark, writeCorpus(corpus), out,
      TargetConfig(compression = Some("GZIP")), clock = () => "T1")
    val alphaPath = res.outputs.find(_.stream == "alpha").get.path
    assert(alphaPath.endsWith("alpha-T1.gz.parquet"))
    val parts = new java.io.File(alphaPath).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty && parts.forall(_.getName.contains(".gz.")))
  }

  test("metadata columns added when configured (L1)") {
    val out = outDir()
    SingerPipeline.run(spark, writeCorpus(corpus), out,
      TargetConfig(addMetadataColumns = true), clock = () => "T2")
    val alpha = spark.read.parquet(s"$out/alpha-T2.parquet")
    assert(alpha.columns.contains("_sdc_extracted_at") && alpha.columns.contains("_sdc_batched_at"))
    val r = alpha.collect().head
    assert(r.getAs[String]("_sdc_extracted_at") == "2024-05-01T00:00:00.000000Z")
    assert(r.getAs[String]("_sdc_batched_at") == "T2")
  }

  test("re-emitted SCHEMA reshapes subsequent records (positional last-wins, P3)") {
    val out = outDir()
    val lines = Seq(
      schemaMsg("alpha"),
      """{"type": "RECORD", "stream": "alpha", "record": {"pk": 1, "v_str": "a", "v_int": 1}}""",
      // schema evolution: the tap re-emits with an extra declared column
      schemaMsg("alpha", """, "v_new": {"type": ["null", "string"]}"""),
      """{"type": "RECORD", "stream": "alpha", "record": {"pk": 2, "v_str": "b", "v_int": 2, "v_new": "n"}}""")
    // inferExtraFields=false so shapes come from the DECLARED schemas only:
    // under the old first-wins registration v_new would be dropped entirely.
    SingerPipeline.run(spark, writeCorpus(lines), out,
      TargetConfig(inferExtraFields = false), clock = () => "T4")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$out/alpha-T4.parquet")
    assert(df.count() == 2)
    val byPk = df.collect().map(r => r.getAs[Long]("pk") -> r.getAs[String]("v_new")).toMap
    assert(byPk(1L) == null) // record 1 was shaped by schema v1 (no v_new)
    assert(byPk(2L) == "n")  // record 2 by the re-emitted v2
  }

  test("streams_in_separate_folder writes one folder per stream (X2 spark-native)") {
    val out = outDir()
    val res = SingerPipeline.run(spark, writeCorpus(corpus), out,
      TargetConfig(streamsInSeparateFolder = true), clock = () => "T3")
    assert(res.outputs.map(_.path).toSet ==
      Set(s"$out/alpha", s"$out/beta", s"$out/gamma"))
  }
}
