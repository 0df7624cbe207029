package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** (nlist, nprobe) cost-model sweep for the IVF family (judge r13
  * Next #8 stretch): the registered rows pin fixture-tuned constants
  * (nlist=32/nprobe=4 on the clustered gate); this measures how recall
  * and serve latency move around those points, and how the right nlist
  * drifts with corpus size — the √N-class rule a 100-TB deployment
  * would use to re-derive them.
  *
  * Two deterministic clustered fixtures ([[
  * graft.operators.Similarity.clusteredCorpus]]): the gate's n=2000 /
  * 32 planted clusters, and a 10x n=20000 / 128 clusters. For each
  * (nlist, coverage) cell: recall@5 over 50 queries vs brute truth +
  * the median-of-3 wall-clock of the IVF serve.
  */
object IvfCostModel {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    def cell(all: org.apache.spark.sql.DataFrame, exact: Map[Long, Set[Long]],
             nlist: Int, nprobe: Int): (Double, Double) = {
      def q() = Similarity.ivfTopKOn(all, nQueries = 50, k = 5,
        nlist = nlist, nprobe = nprobe)
      q().write.format("noop").mode("overwrite").save() // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val got = q().collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      val hits = exact.map { case (k, t) => (t & got.getOrElse(k, Set.empty)).size }.sum
      (hits.toDouble / exact.values.map(_.size).sum, ts.sorted.apply(1))
    }

    for ((n, ncl) <- Seq((2000, 32), (20000, 128))) {
      val all = Similarity.clusteredCorpus(spark, n = n, nClusters = ncl)
        .localCheckpoint()
      val exact = Similarity.bruteForceTopKOn(all, nQueries = 50, k = 5)
        .collect().groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      println(s"\nfixture n=$n planted=$ncl  (sqrt(n) = ${math.sqrt(n).toInt})")
      println("| nlist | nprobe | coverage | recall@5 | serve s |")
      println("|---|---|---|---|---|")
      for (nlist <- Seq(8, 16, 32, 64, 128);
           nprobe <- Seq(1, 2, 4, 8).filter(_ <= nlist)) {
        val (r, t) = cell(all, exact, nlist, nprobe)
        println(f"| $nlist | $nprobe | ${nprobe * 100.0 / nlist}%.1f%% | $r%.3f | $t%.2f |")
      }
    }
    spark.stop()
  }
}
