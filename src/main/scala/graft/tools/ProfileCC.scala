package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline profiling aid: phase timings for Dedup.connectedComponents
  * (large-star/small-star) — pair-feed cost vs star-loop cost. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm-up (JIT + codegen + parquet footers)
    graft.operators.Dedup.clusterAssignments(spark, dir).write
      .format("noop").mode("overwrite").save()

    val pairs = t("pairs join") {
      val p = graft.operators.Dedup.jaccardPairsUnsorted(spark, dir, 0.85).localCheckpoint()
      println(s"[profile] n_pairs=${p.count()}"); p
    }
    val comp = t("connectedComponents total") {
      val c = graft.operators.Dedup.connectedComponents(pairs, assumeNormalized = true)
      println(s"[profile] n_labeled=${c.count()}"); c
    }

    // Inlined copy of the star loop with per-phase timings.
    t("inlined star loop") {
      var e = pairs.select(col("doc_b").as("la"), col("doc_a").as("lb")).localCheckpoint()
      var iter = 0
      var converged = false
      var prevCount = e.count()
      while (!converged && iter < 50) {
        val ls = t(s"round $iter largeStar") {
          val sym = e.select(col("la").as("u"), col("lb").as("v"))
            .union(e.select(col("lb").as("u"), col("la").as("v")))
          val m = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
          sym.filter(col("v") > col("u")).join(m, "u")
            .select(col("v").as("la"), col("m").as("lb"))
            .filter(col("la") =!= col("lb"))
            .distinct()
            .localCheckpoint()
        }
        println(s"[profile] round $iter ls_count=${ls.count()}")
        val ss = t(s"round $iter smallStar") {
          val m = ls.groupBy("la").agg(min(col("lb")).as("m"))
          ls.join(m, "la")
            .select(col("lb").as("la"), col("m").as("lb"))
            .union(m.select(col("la"), col("m").as("lb")))
            .filter(col("la") =!= col("lb"))
            .distinct()
            .localCheckpoint()
        }
        val c = ss.count()
        println(s"[profile] round $iter ss_count=$c")
        converged = t(s"round $iter check") {
          c == prevCount && ss.as("x")
            .join(ss.as("y"), col("x.lb") === col("y.la"), "left_semi").isEmpty
        }
        prevCount = c
        e = ss
        iter += 1
      }
      println(s"[profile] iters=$iter converged=$converged")
    }
    t("full clusterAssignments (cold plan, warm caches)") {
      graft.operators.Dedup.clusterAssignments(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    comp.unpersist()
    spark.stop()
  }
}
