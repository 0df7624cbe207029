package graft.streaming

import java.io.{OutputStreamWriter, PipedInputStream, PipedOutputStream, PrintWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.model.TargetConfig

/** The live-pipe UX (reference __init__.py:215,352): input arrives
  * incrementally over an OPEN pipe and per-batch parquet + state bookmarks
  * must exist before EOF. */
class StdinSpoolerSpec extends SparkSpec {

  private val schemaLine =
    """{"type": "SCHEMA", "stream": "s1", "schema": {"properties": {
      |"pk": {"type": ["null", "integer"]}}, "type": "object"},
      |"key_properties": ["pk"]}""".stripMargin.replace("\n", " ")

  private def awaitChunks(sp: StdinSpooler, n: Int): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (sp.chunksWritten < n && System.nanoTime() < deadline) Thread.sleep(20)
    assert(sp.chunksWritten >= n, s"spooler never rolled chunk $n")
  }

  test("live pipe: parquet + bookmark appear per batch BEFORE EOF") {
    val watch = Files.createTempDirectory("spool-watch")
    val out = Files.createTempDirectory("spool-out").toString
    val cp = Files.createTempDirectory("spool-cp").toString

    val pipeOut = new PipedOutputStream()
    val pipeIn = new PipedInputStream(pipeOut, 1 << 16)
    val tap = new PrintWriter(new OutputStreamWriter(pipeOut, UTF_8), true)

    // maxIntervalMs high: chunks roll ONLY on the 3-line boundary, so the
    // test is deterministic.
    val spooler = new StdinSpooler(pipeIn, watch, maxLines = 3,
      maxIntervalMs = 60000).start()
    val ingest = new StreamingIngest(spark, out,
      TargetConfig(streamsInSeparateFolder = true))
    val query = ingest.start(watch.toString, cp,
      Trigger.ProcessingTime("100 milliseconds"))
    try {
      // chunk 1 — the pipe stays OPEN
      tap.println(schemaLine)
      tap.println("""{"type": "RECORD", "stream": "s1", "record": {"pk": 1}}""")
      tap.println("""{"type": "STATE", "value": {"bookmarks": {"s1": 1}}}""")
      awaitChunks(spooler, 1)
      query.processAllAvailable()
      assert(spark.read.parquet(s"$out/s1").count() == 1)
      assert(ingest.emittedState.contains("""{"bookmarks":{"s1":1}}"""))

      // chunk 2 rolls at EOF (only 1 line buffered)
      tap.println("""{"type": "RECORD", "stream": "s1", "record": {"pk": 2}}""")
      tap.close()
      spooler.awaitEof()
      assert(spooler.chunksWritten == 2)
      query.processAllAvailable()
      assert(spark.read.parquet(s"$out/s1").count() == 2)
      assert(ingest.emittedState.isEmpty) // P8: record after the last STATE
    } finally query.stop()
  }

  test("reader I/O failure: buffered lines flush, awaitEof rethrows (no silent EOF)") {
    val watch = Files.createTempDirectory("spool-fail")
    val boom = new java.io.IOException("broken pipe")
    val in = new java.io.InputStream {
      private val data = "line-1\nline-2\n".getBytes(UTF_8)
      private var i = 0
      override def read(): Int =
        if (i < data.length) { val b = data(i); i += 1; b & 0xff }
        else throw boom
    }
    val spooler = new StdinSpooler(in, watch, maxLines = 100,
      maxIntervalMs = 60000).start()
    val e = intercept[java.io.IOException] { spooler.awaitEof() }
    assert(e eq boom)
    assert(spooler.eofReached) // flusher released, final chunk on disk
    assert(spooler.chunksWritten == 1) // the two buffered lines were NOT dropped
  }
}
