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
    val ingest = new StreamingIngest(spark, out, TargetConfig())

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
