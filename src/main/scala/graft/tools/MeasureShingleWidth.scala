package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Shingle-width decision grid (r16 — evidence for BASELINE.md): per
  * corpus and per candidate width 2..8, the two statistics the
  * [[graft.operators.Dedup.chooseShingleWidth]] rule reads — sampled raw
  * candidate mass Σ_g C(df_g, 2) vs C(sample, 2) all-pairs — plus the
  * recall-side one-substitution self-jaccard, all computed with the
  * engine's own sampler recipe (≤512 hash-mod docs, token cap, the
  * HashedNGrams chain via [[Dedup.distinctGramsAt]]). One line per
  * (corpus, width); the row the decision picks is marked. Corpora: the
  * three testdata scales plus the two spec fixtures (splitmix vocab-20
  * — the width-4 flip — and the unmixed Weyl stream — the no-eligible-
  * width enumeration regime). */
object MeasureShingleWidth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mk(name: String, mixed: Boolean): String = {
      val d = s"target/shinglewidth_$name"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$d/documents.parquet"))) {
        spark.range(400).map { dd =>
          val t = (0 until 120).map { j =>
            val i = dd * 120 + j
            val h = if (!mixed) i * -7046029254386353131L
                    else { var z = i * -7046029254386353131L
                           z ^= (z >>> 30); z *= -4658895280553007687L
                           z ^= (z >>> 27); z *= -7723592293110705685L
                           z ^= (z >>> 31); z }
            "w" + (((h >>> 40) % 20 + 20) % 20)
          }.mkString(" ")
          (dd, t, "en", "syn", 600L)
        }.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$d/documents.parquet")
      }
      d
    }

    val corpora = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "mix20" -> mk("mix20", mixed = true),
      "weyl20" -> mk("weyl20", mixed = false))

    corpora.foreach { case (name, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val mod = math.max(1L, n / 512)
      val sample = (if (mod == 1L) docs
        else docs.filter(pmod(xxhash64(col("doc_id")), lit(mod)) === 0))
        .select(col("doc_id"),
          slice(transform(split(col("text"), " "), t => xxhash64(t)),
            1, 4096).as("th"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1).map(_._2)
      val ns = sample.length
      val pairs = ns.toLong * (ns - 1) / 2
      val plan = Dedup.chooseShingleWidth(spark, dir)
      println(s"== $name n=$n sample=$ns pairs=$pairs chosen=$plan")
      (2 to 8).foreach { w =>
        val df = new java.util.HashMap[Long, Long]()
        sample.foreach(t => Dedup.distinctGramsAt(t, w).foreach(g =>
          df.merge(g, 1L, _ + _)))
        var cand = 0L
        df.values.forEach(c => cand += c * (c - 1) / 2)
        val probes = sample.iterator.filter(_.nonEmpty).take(128).toArray
        val rob = probes.iterator.map { t =>
          val m = t.clone(); m(t.length / 2) = 0x5f3759df
          val (a, b) = (Dedup.distinctGramsAt(t, w).toSet,
            Dedup.distinctGramsAt(m, w).toSet)
          val in = a.intersect(b).size
          in.toDouble / (a.size + b.size - in)
        }.sum / math.max(probes.length, 1)
        val mark = if (w == plan.width) " <== chosen" else ""
        println(f"  w=$w candMass=$cand%9d ratioVsPairs=${cand.toDouble / pairs}%10.4f " +
          f"eligible=${cand < pairs}%-5s selfJ1sub=$rob%.6f$mark")
      }
    }
    spark.stop()
  }
}
