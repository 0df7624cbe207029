package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Offline calibration aid for [[graft.operators.Similarity.annAutoPlanOn]]
  * (the GateMargins pattern: the planner's constants are recorded
  * decisions, not guesses). Prints, per corpus, the derived plan
  * (decision / nlist / nprobe) and the fresh wall-clock of the dispatched
  * plan vs always-brute — the measurement behind `bruteFloor` and behind
  * the oracle row's pinned (nlist, nprobe) literals.
  * Usage: runMain graft.tools.MeasureAutoAnn [sfDir ...]
  */
object MeasureAutoAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def cell(tag: String, all: org.apache.spark.sql.DataFrame,
             nQueries: Int): Unit = {
      val c = all.localCheckpoint()
      val (plan, _) = Similarity.annTopKAutoOn(c, nQueries, 5)
      val (_, tAuto) = time(Similarity.annTopKAutoOn(c, nQueries, 5)._2.count())
      val (_, tBrute) = time(Similarity.bruteForceTopKOn(c, nQueries, 5).count())
      println(f"$tag%-28s n=${plan.n}%7d Q=$nQueries%3d -> ${plan.decision}%-5s " +
        f"nlist=${plan.nlist}%5d nprobe=${plan.nprobe}%3d " +
        f"auto=$tAuto%6.2fs brute=$tBrute%6.2fs")
    }

    cell("clustered n=2000 (gate)", Similarity.clusteredCorpus(spark), 50)
    cell("clustered n=200 (gate)", Similarity.clusteredCorpus(spark, n = 200), 20)
    cell("clustered n=1024", Similarity.clusteredCorpus(spark, n = 1024), 50)
    cell("clustered n=20000 c=128",
      Similarity.clusteredCorpus(spark, n = 20000, nClusters = 128), 50)
    cell("clustered n=2000 Q=10", Similarity.clusteredCorpus(spark), 10)
    cell("clustered n=20000 c=128 Q=200",
      Similarity.clusteredCorpus(spark, n = 20000, nClusters = 128), 200)
    args.foreach { dir =>
      cell(s"corpus $dir", Similarity.corpus(spark, dir), 50)
    }
    spark.stop()
  }
}
