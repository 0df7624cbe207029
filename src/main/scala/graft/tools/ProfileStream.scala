package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.streaming.StreamingAnalytics

/** Local measurement aid: per-microbatch duration breakdown for the
  * spooled streaming queries, to attribute wall time between offset
  * discovery (file listing), state commit and the batch itself when a
  * suite row moves without a code change behind it. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("attribution")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"total=${dur.get("triggerExecution")}ms " +
          s"addBatch=${dur.getOrDefault("addBatch", -1L)} " +
          s"latestOffset=${dur.getOrDefault("latestOffset", -1L)} " +
          s"commitOffsets=${dur.getOrDefault("commitOffsets", -1L)} " +
          s"queryPlanning=${dur.getOrDefault("queryPlanning", -1L)} " +
          s"walCommit=${dur.getOrDefault("walCommit", -1L)} " +
          s"stateCommit=${dur.getOrDefault("commitBatch", -1L)}")
      }
    })
    val t0 = System.nanoTime()
    val out = which match {
      case "attribution" => StreamingAnalytics.clickAttributionSpooled(s, dir)
      case "sessions"    => StreamingAnalytics.sessionizeSpooled(s, dir)
      case "upsert"      => StreamingAnalytics.upsertSpooled(s, dir)
      case other => throw new IllegalArgumentException(other)
    }
    val n = out.count()
    println(f"[stream] $which total=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  }
}
