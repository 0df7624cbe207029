package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local measurement aid: recall of the approximate similarity/dedup
  * operators vs their exact counterparts, for gate-bound calibration. */
object MeasureRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators._
    val exact = Similarity.bruteForceTopK(s, dir).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bands <- Seq(8, 16, 32)) {
      val got = Similarity.lshTopK(s, dir, bands = bands)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[recall] lshTopK bands=$bands recall=${(exact & got).size.toDouble / exact.size}")
    }
    for (nprobe <- Seq(4, 6, 8, 10, 12)) {
      val got = Similarity.ivfTopK(s, dir, nprobe = nprobe)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[recall] ivfTopK nprobe=$nprobe recall=${(exact & got).size.toDouble / exact.size}")
    }
    for ((m, ksub) <- Seq((8, 16), (8, 32), (16, 16), (16, 32));
         rerank <- Seq(16, 32, 64, 128)) {
      val got = Similarity.pqTopK(s, dir, m = m, ksub = ksub, rerank = rerank)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[recall] pqTopK m=$m ksub=$ksub rerank=$rerank recall=${(exact & got).size.toDouble / exact.size}")
    }
    for (nprobe <- Seq(8, 12, 16); rerank <- Seq(32, 64)) {
      val got = Similarity.ivfPqTopK(s, dir, nprobe = nprobe, rerank = rerank)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[recall] ivfPqTopK nprobe=$nprobe rerank=$rerank recall=${(exact & got).size.toDouble / exact.size}")
    }
    // Graph-ANN beam search over the mutual-kNN artifact: recall vs
    // beam/rounds for the annGraphGate bound (uniform corpus = worst
    // case; each query starts at its own node).
    for (beam <- Seq(8, 16, 32); rounds <- Seq(2, 4, 6)) {
      val got = Similarity.graphTopK(s, dir, beam = beam, rounds = rounds)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[recall] graphTopK beam=$beam rounds=$rounds " +
        s"recall=${(exact & got).size.toDouble / exact.size}")
    }
    // Raw vs RESIDUAL encoding (VERDICT r6 stretch): residual should pull
    // ahead as nlist grows and cells tighten; equal-coverage probes
    // (nprobe scaled with nlist) keep the comparison honest.
    for ((nlist, nprobe) <- Seq((16, 12), (64, 48)); res <- Seq(false, true)) {
      val got = Similarity.ivfPqTopK(s, dir, nlist = nlist, nprobe = nprobe,
          rerank = 32, residual = res)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[recall] ivfPqTopK nlist=$nlist nprobe=$nprobe rerank=32 " +
        s"residual=$res recall=${(exact & got).size.toDouble / exact.size}")
    }
    // Residual's WIN regime (VERDICT r7 #6): the real corpus has uniform
    // directions (cells never tighten — residual loses there, see
    // BASELINE.md round 7), so measure on a CLUSTERED synthetic corpus:
    // 8 tight direction clusters (center + sigma*noise, normalized,
    // seeded). Residual codes quantize v − c_list, whose spread is the
    // within-cluster sigma, far below the vector spread — the codebook's
    // 256 cells cover a much smaller ball, so at small rerank residual
    // should recover neighbors raw codes blur away.
    locally {
      val rnd = new scala.util.Random(42)
      val dim = 64; val nClusters = 8; val nVecs = 2000; val sigma = 0.08
      def unit(v: Array[Double]): Array[Float] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(x => (x / n).toFloat)
      }
      val centers = Array.fill(nClusters)(
        unit(Array.fill(dim)(rnd.nextGaussian())))
      val vecs = (0 until nVecs).map { i =>
        val c = centers(i % nClusters)
        (i.toLong,
          unit(c.map(_.toDouble).zip(Array.fill(dim)(rnd.nextGaussian()))
            .map { case (cv, g) => cv + sigma * g }),
          i % nClusters)
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft-clustered").toString
      import s.implicits._
      vecs.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      // 50 queries × k=5 = 250 truth edges per point, and rerank at its
      // floor: the exact re-rank repairs whatever the codes got wrong, so
      // encoding quality is visible ONLY while rerank is small.
      val nq = 50
      val cexact = Similarity.bruteForceTopK(s, tmp, nQueries = nq)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (rerank <- Seq(5, 8, 16, 32); res <- Seq(false, true)) {
        val got = Similarity.ivfPqTopK(s, tmp, nQueries = nq, nlist = 16,
            nprobe = 4, rerank = rerank, residual = res)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[recall] CLUSTERED ivfPqTopK nq=$nq nlist=16 nprobe=4 rerank=$rerank " +
          s"residual=$res recall=${(cexact & got).size.toDouble / cexact.size}")
      }
      for (beam <- Seq(8, 16); rounds <- Seq(2, 4)) {
        val got = Similarity.graphTopK(s, tmp, nQueries = nq,
            beam = beam, rounds = rounds)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[recall] CLUSTERED graphTopK nq=$nq beam=$beam rounds=$rounds " +
          s"recall=${(cexact & got).size.toDouble / cexact.size}")
      }
    }
    // IVF list balance + quantization quality (embed_cluster gate bounds)
    val asg = Similarity.ivfAssignments(s, dir)
    val n = asg.count()
    val maxN = asg.groupBy("list_id").count().agg(max("count")).first().getLong(0)
    val nLists = asg.select("list_id").distinct().count()
    println(s"[recall] ivf n=$n n_lists=$nLists max_share=${maxN.toDouble / n}")
    val gate = Gates.embedClusterGate(s, dir).collect().head
    println(s"[recall] embedClusterGate row=$gate")

    val truth = Dedup.jaccardPairs(s, dir, 0.9).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(s, dir, threshold = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[recall] minhash est-filter recall=${(truth & mh).size.toDouble / truth.size} precision=${(truth & mh).size.toDouble / mh.size}")
    val mhv = Dedup.minhashPairsVerified(s, dir, threshold = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[recall] minhash verified (gate path) recall=${(truth & mhv).size.toDouble / truth.size} precision=${(truth & mhv).size.toDouble / mhv.size}")
    s.stop()
  }
}
