package graft.streaming

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Live stdin as a DataSource-v2 `MicroBatchStream` (SURVEY §4.3 item 4):
  * the unbounded `tap | target` deployment shape with NO pre-spool — a
  * daemon thread drains the pipe into a driver-side line buffer, each
  * trigger takes the lines that arrived since the last one, and commit
  * evicts everything at or below the committed offset, so driver memory
  * is bounded by (arrival rate × trigger interval), not by the run.
  *
  * Offsets are cumulative line counts — the natural exactly-once framing
  * for a serial byte stream. WITHIN a run any uncommitted range replays
  * exactly (lines stay buffered until commit, which is all the engine
  * needs for task retries). ACROSS a crash a pipe cannot be re-read:
  * planInputPartitions throws on an evicted range instead of silently
  * resuming with a gap. That restart gap is the reference's own behavior
  * (a crashed run loses everything since its last state); the spooled
  * path ([[StdinSpooler]] + file source) remains the deployment with
  * durable replay, and this source is the zero-copy live alternative.
  *
  * One input partition per batch: stdin is inherently a serial stream,
  * so the parallelism happens DOWNSTREAM (parse/validate/write fan out
  * over the cluster after the first exchange), exactly like the
  * reference's single reader loop feeding its consumer process.
  *
  * `StdinStream.inputFactory` injects the stream (tests feed a pipe;
  * production leaves it at `System.in`).
  */
object StdinStream {
  val schema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = false)))
  @volatile var inputFactory: () => InputStream = () => System.in

  /** True once the CURRENT stream's input hit EOF (or failed) — the
    * driver loop in [[graft.Main]] polls this to know when the tap
    * closed the pipe (a pipe-fed query otherwise idles forever). Reset
    * when a new stream starts; stdin is one serial pipe, so at most one
    * live stream exists at a time. */
  @volatile private[streaming] var eof = false
  def eofReached: Boolean = eof
}

final class StdinStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StdinStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StdinTable
}

final class StdinTable extends Table with SupportsRead {
  override def name(): String = "graft_stdin"
  override def schema(): StructType = StdinStream.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = StdinStream.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new StdinMicroBatchStream(StdinStream.inputFactory())
    }
}

/** Line-count offset; json form is just the number. */
final case class StdinOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class StdinMicroBatchStream(in: InputStream) extends MicroBatchStream {
  // Lines [evicted, evicted + buf.size); guarded by `this`.
  private val buf = new util.ArrayList[String]()
  private var evicted = 0L
  @volatile private var failure: Throwable = _

  StdinStream.eof = false
  private val reader = new Thread(() => {
    try {
      val br = new BufferedReader(new InputStreamReader(in, UTF_8))
      var line = br.readLine()
      while (line != null) {
        synchronized { buf.add(line) }
        line = br.readLine()
      }
    } catch { case t: Throwable => failure = t }
    finally StdinStream.eof = true
  }, "graft-stdin-source")
  reader.setDaemon(true)
  reader.start()

  private def rethrow(): Unit =
    if (failure != null)
      throw new IllegalStateException("stdin source reader failed", failure)

  override def initialOffset(): Offset = StdinOffset(0L)
  override def latestOffset(): Offset = synchronized {
    rethrow(); StdinOffset(evicted + buf.size)
  }
  override def deserializeOffset(json: String): Offset =
    StdinOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val (s, e) = (start.asInstanceOf[StdinOffset].n, end.asInstanceOf[StdinOffset].n)
      if (s < evicted)
        throw new IllegalStateException(
          s"stdin cannot replay committed offsets ($s < $evicted): a pipe is " +
            "not re-readable across restarts — use the StdinSpooler file-source " +
            "deployment when crash recovery must re-deliver")
      val lines = new Array[String]((e - s).toInt)
      var i = 0
      while (i < lines.length) {
        lines(i) = buf.get((s - evicted).toInt + i); i += 1
      }
      Array(StdinPartition(lines))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new StdinReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[StdinOffset].n
    while (evicted < upTo && !buf.isEmpty) { buf.remove(0); evicted += 1 }
  }

  override def stop(): Unit =
    try in.close() catch { case _: java.io.IOException => () }
}

/** The batch's lines ship inside the partition (driver → the one task),
  * mirroring how the reference hands parsed lines to its consumer. */
final case class StdinPartition(lines: Array[String]) extends InputPartition

final class StdinReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[StdinPartition].lines
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}
