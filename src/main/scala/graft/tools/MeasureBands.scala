package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the LSH band-geometry trade the auto decision navigates
  * (judge r14 Next #8): per (bands, r) with b·r = k, the closed-form
  * recall 1−(1−t^r)^b at each threshold and the TRUE full-corpus raw
  * candidate volume (the band join's cost term), plus the engine's
  * decision at each threshold — the BASELINE.md r15 table's source.
  *
  * Run:  java -cp ... graft.tools.MeasureBands <dir> [t1,t2,...]
  * Env:  SPARK_GRAFT_CPUS (default 32)
  */
object MeasureBands {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val thresholds = args.drop(1).headOption.getOrElse("0.9,0.7")
      .split(",").map(_.trim.toDouble).toSeq
    val k = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val sigArr = Dedup.minhashSignatureArrays(spark, dir, k).localCheckpoint()
    // full-corpus RAW band-match volume per geometry (the exactly-once
    // retention dedups this stream downstream, but the join pays it
    // first — count the raw meetings, not the retained candidates)
    val geoms = (0 to 30).map(1 << _).filter(r => r <= k && k % r == 0)
    val vols = geoms.map { r =>
      val b = k / r
      val t0 = System.nanoTime()
      val cand = Dedup.bandCandidates(sigArr, b, r).count()
      (r, b, cand, (System.nanoTime() - t0) / 1e9)
    }
    def ms(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    thresholds.foreach { t =>
      val plan = Dedup.chooseBandGeometry(spark, dir, k, t)
      val rows = vols.map { case (r, b, cand, sec) =>
        val recall = 1.0 - math.pow(1.0 - math.pow(t, r), b)
        s"""{"r":$r,"b":$b,"recall":${ms(recall)},"cand":$cand,""" +
          s""""sec":${ms(sec)}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"band_measure","dir":"$dir","t":$t,""" +
        s""""decision":{"b":${plan.bands},"r":${plan.r},""" +
        s""""recall":${ms(plan.recallAtThreshold)},""" +
        s""""sampled_cand":${plan.sampledCandidates}},"geometries":$rows}""")
    }
    spark.stop()
  }
}
