package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Graph

/** Stage timing for graph_triangles at an SF dir: the exact-kNN build
  * (pair scan + rank window) vs the mutual join vs the triangle closure,
  * to attribute the bench row before optimizing the wrong stage. */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dot
    def pairsOnly(rep: Boolean) = {
      val base = graft.operators.Similarity.corpus(spark, dir)
      val all = if (rep) base.repartition(col("vec_id")) else base
      val queries = base.select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      all.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .select((dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("cosine"))
        .agg(max("cosine")).collect()
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      Graph.knnDirected(spark, dir, 5).explain("formatted")
      spark.stop(); return
    }
    import org.apache.spark.sql.expressions.Window
    def knnAb(rep: Boolean): Long = {
      val base = graft.operators.Similarity.corpus(spark, dir)
      val all = if (rep) base.repartition(col("vec_id")) else base
      val w = Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))
      all.join(broadcast(base.select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qnrm"))), col("vec_id") =!= col("qid"))
        .select(col("qid").as("src"), col("vec_id").as("dst"),
          (dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("cosine"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5).select("src", "dst").count()
    }
    for (_ <- 1 to 4) {
      time("knn A no repart") { knnAb(rep = false) }
      time("knn B repart") { knnAb(rep = true) }
    }
    for (_ <- 1 to 2) {
      time("pairs+dot, no repart") { pairsOnly(rep = false) }
      time("pairs+dot, repart") { pairsOnly(rep = true) }
      time("triangleCounts.count") { Graph.triangleCounts(spark, dir).count() }
    }
    spark.stop()
  }
}
