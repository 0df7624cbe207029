package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import graft.model.TargetConfig
import graft.pipeline.SingerPipeline
import graft.sources.S3Conf

/** CLI entry point with the reference's UX (reference __init__.py:334-358,
  * setup.py:39-42): read newline-delimited Singer messages from stdin (or
  * `--input file` for testing), `--config config.json` with the same keys,
  * write per-stream Parquet to the bucket/prefix, emit the final state
  * bookmark to stdout.
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

    // Spool stdin to a file so the input is splittable/re-scannable (the
    // batch pipeline makes several passes; a 100 TB deployment points
    // --input at the durable landing zone instead).
    val input = opts.get("input") match {
      case Some(p) => p
      case None =>
        val tmp = Files.createTempFile("singer-stdin", ".jsonl")
        Files.copy(System.in, tmp, StandardCopyOption.REPLACE_EXISTING)
        if (Files.size(tmp) == 0L)
          System.err.println("[graft] warning: 0 bytes read from stdin — " +
            "is the tap connected? (zero-message input is not an error)")
        tmp.toString
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-target")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    S3Conf(spark, config)

    try {
      val result = SingerPipeline.run(spark, input, output, config)
      result.outputs.foreach(o =>
        System.err.println(s"[graft] wrote ${o.rows} rows -> ${o.path}"))
      SingerPipeline.emitState(result.state)
    } finally spark.stop()
  }
}
