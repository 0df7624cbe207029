package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 optimization measurement: the exact branch-and-bound kNN build's
  * wall time as a function of `nlist`, at 1x and (optionally) the 10x
  * scale dir — the evidence behind replacing [[graft.operators.Graph]]'s
  * flat `nlist = 16` with a corpus-derived rule.
  *
  * Cost shape (knnBuildFrom): phase-1 is the same-list self-join,
  * Σ_j |list_j|² ≈ N²/nlist candidate rows each paying an O(d) dot; the
  * phase-2 probe relation is N·(nlist−1) rows pre-bound. Flat nlist
  * leaves phase-1 quadratic in N; balancing the two terms puts the
  * optimum near √(N·d / c). This tool measures the real curve (the
  * constant c is machine/plan-dependent) instead of trusting the model.
  *
  * Output is EXACT at any nlist (the spherical bound only prunes
  * candidates that provably cannot reach τ), so the sweep also asserts
  * bit-equality of the directed edge set against the nlist=16 build.
  *
  * Usage: runMain graft.tools.MeasureKnnNlist <dir> [nlist,nlist,...]
  */
object MeasureKnnNlist {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlists = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(16, 32, 64, 128, 256))
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // "10x:<base>" builds (once) and probes the standard 10x scale dir
    val probeDir = if (dir.startsWith("10x:")) {
      val base = dir.stripPrefix("10x:")
      val out = "target/scale10"
      ScaleProbe.buildScaled(spark, base, out, 10)
      out
    } else dir
    val n = graft.operators.Similarity.corpus(spark, probeDir).count()
    def runOnce(nlist: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Graph.knnDirected(spark, probeDir, k, nlist)
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }
    // reference edges at nlist=16 for the exactness assertion (N·k rows,
    // tool-only driver collect — bounded by the probe corpus)
    val ref: Set[(Long, Long)] = graft.operators.Graph
      .knnDirected(spark, probeDir, k, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // phase decomposition (env MEASURE_KNN_PHASES=1): knnBuild eagerly
    // materializes p1top (localCheckpoint), so timing the call isolates
    // assignment + phase-1; probes.count adds the probe-side pruning;
    // the full noop adds the phase-2 member join + final re-rank.
    if (sys.env.get("MEASURE_KNN_PHASES").contains("1")) {
      nlists.foreach { nl =>
        var t0 = System.nanoTime()
        val (p1, probes, knn) =
          graft.operators.Graph.knnBuild(spark, probeDir, k, nl)
        val tP1 = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val nProbes = probes.count()
        val tProbes = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        knn.write.format("noop").mode("overwrite").save()
        val tKnn = (System.nanoTime() - t0) / 1e9
        val nP1 = p1.count()
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        println(f"knn_phase nlist=$nl%4d p1_s=$tP1%.2f (rows=$nP1) " +
          f"probes_s=$tProbes%.2f (rows=$nProbes) full_s=$tKnn%.2f")
      }
      spark.stop(); return
    }
    nlists.foreach { nl =>
      runOnce(nl) // warm-up
      val ts = Seq.fill(3)(runOnce(nl)).sorted
      val med = ts(1)
      val got: Set[(Long, Long)] = graft.operators.Graph
        .knnDirected(spark, probeDir, k, nl)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mismatch = (ref diff got).size + (got diff ref).size
      println(f"knn_nlist dir=$dir n=$n k=$k nlist=$nl%4d " +
        f"median_s=$med%.3f (${ts.map(t => f"$t%.2f").mkString(",")}) " +
        s"edge_mismatch=$mismatch")
    }
    spark.stop()
  }
}
