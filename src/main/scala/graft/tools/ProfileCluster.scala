package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline profiling aid: phase timings for Dedup.clusterAssignments. */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm-up
    graft.operators.Dedup.clusterAssignments(spark, dir).write
      .format("noop").mode("overwrite").save()

    val pairs = t("pairs join") {
      graft.operators.Dedup.jaccardPairsUnsorted(spark, dir, 0.85).localCheckpoint()
    }
    println(s"[profile] n_pairs=${pairs.count()}")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = t("init labels") {
      edges.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint()
    }
    println(s"[profile] n_nodes=${labels.count()}")
    var prevSum = labels.agg(sum("cluster_id").cast("long")).first().getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val updated = t(s"round $iter join+agg") {
        val msgs = edges.join(labels, edges("dst") === labels("doc_id"))
          .select(col("src").as("doc_id"), col("cluster_id"))
        labels.union(msgs).groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
          .localCheckpoint()
      }
      val s2 = t(s"round $iter sum")(updated.agg(sum("cluster_id").cast("long")).first().getLong(0))
      converged = s2 == prevSum; prevSum = s2; labels = updated; iter += 1
    }
    println(s"[profile] iters=$iter")
    spark.stop()
  }
}
