package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE trainer depth measurement (judge r10 Next #4): the incremental
  * delta trainer vs the re-segmenting distributed trainer at matched
  * depths, plus the incremental trainer at production-ish depth (4096
  * merges) where the re-segmenting one is prohibitive. Prints one line
  * per (trainer, depth) with wall seconds and a sequence-equality check
  * at the shared depth.
  */
object MeasureBpeDepth {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val deep = sys.env.getOrElse("SPARK_GRAFT_BPE_DEPTH", "4096").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // SPARK_GRAFT_BPE_PROD=1 (judge r11 Next #7): full production depth —
    // a ~200k-distinct-word corpus (the scale of a real web-corpus
    // vocabulary after frequency capping) and a bounded 32k-merge run of
    // the incremental trainer, with a 256-merge probe first (ETA) and a
    // 4096-merge anchor for the prefix-consistency check. Corpus: 200k
    // distinct 5-char base-26 words (bijective LCG over the 5-char id
    // range, so distinctness is by construction), 10k docs x 200 words,
    // draw position p -> word (p*48271 mod 200000) — a permutation
    // pattern, every word appears exactly 10 times. Seed-free; built
    // once under target/bpecorpus200k.
    if (sys.env.get("SPARK_GRAFT_BPE_PROD").contains("1")) {
      val prod = "target/bpecorpus200k"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$prod/documents.parquet"))) {
        import spark.implicits._
        def word5(r: Long): String = {
          // [26^4, 26^5): all 5-char words; 104729 prime, coprime to the
          // modulus, so r -> v is injective for r < 11,424,400
          var v = 456976L + (r * 104729L + 13L) % 11424400L
          val sb = new StringBuilder
          while (v > 0) { sb += ('a' + (v % 26).toInt).toChar; v /= 26 }
          sb.result()
        }
        spark.range(10000).map { d =>
          val text = (0 until 200).map { j =>
            word5((d * 200 + j) * 48271L % 200000L) }.mkString(" ")
          (d, text, "en", "syn", text.length.toLong)
        }.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$prod/documents.parquet")
      }
      graft.operators.Tokenizer.learnMergesIncremental(spark, prod, nMerges = 8)
      val (seq256, t256) = time(
        graft.operators.Tokenizer.learnMergesIncremental(spark, prod, nMerges = 256))
      println(f"[bpe-prod] 200k vocab, incremental   256 merges: $t256%7.1f s " +
        f"(${t256 / 256 * 1000}%.1f ms/merge)")
      val (seq4k, t4k) = time(
        graft.operators.Tokenizer.learnMergesIncremental(spark, prod, nMerges = 4096))
      println(f"[bpe-prod] 200k vocab, incremental  4096 merges: $t4k%7.1f s " +
        f"(${t4k / 4096 * 1000}%.1f ms/merge); prefix-consistent with 256: ${
          seq4k.take(256) == seq256}")
      val deepN = sys.env.getOrElse("SPARK_GRAFT_BPE_DEPTH", "32768").toInt
      val (seqDeep, tDeep) = time(
        graft.operators.Tokenizer.learnMergesIncremental(spark, prod, nMerges = deepN))
      println(f"[bpe-prod] 200k vocab, incremental $deepN%5d merges: $tDeep%7.1f s " +
        f"(${seqDeep.length} learned, ${
          tDeep / math.max(1, seqDeep.length) * 1000}%.1f ms/merge); " +
        s"prefix-consistent with 4096: ${seqDeep.take(4096) == seq4k}")
      spark.stop(); return
    }

    // warm-up (JIT + parquet footers), untimed
    graft.operators.Tokenizer.learnMergesIncremental(spark, dir, nMerges = 8)

    val (seqDist, tDist) = time(
      graft.operators.Tokenizer.learnMergesDistributed(spark, dir, nMerges = 256))
    val (seqIncr, tIncr) = time(
      graft.operators.Tokenizer.learnMergesIncremental(spark, dir, nMerges = 256))
    println(f"[bpe] re-segmenting distributed, 256 merges: $tDist%.1f s")
    println(f"[bpe] incremental-delta,        256 merges: $tIncr%.1f s")
    println(s"[bpe] merge sequences equal at 256: ${seqDist == seqIncr}")

    val (seqDeep, tDeep) = time(
      graft.operators.Tokenizer.learnMergesIncremental(spark, dir, nMerges = deep))
    println(f"[bpe] incremental-delta,       $deep merges: $tDeep%.1f s " +
      f"(${seqDeep.length} learned, ${tDeep / seqDeep.length * 1000}%.1f ms/merge)")
    println(s"[bpe] deep sequence extends the 256-merge prefix: ${
      seqDeep.take(256) == seqIncr}")

    // The driver testdata has a 31-word vocabulary (138 chars), so BPE
    // EXHAUSTS at ~89 merges on any sf — production depth needs a rich
    // vocabulary. Deterministic synthetic corpus: 20k distinct 4-char
    // base-26 words (sum 80k chars -> tens of thousands of merges
    // available), 2k docs x 100 words, word draw an LCG of the global
    // position. Seed-free; built once under target/bpecorpus.
    val rich = "target/bpecorpus"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$rich/documents.parquet"))) {
      import spark.implicits._
      def word(r: Long): String = {
        var v = 17576L + (r * 7919L + 13L) % 439400L // 4-char base-26 range
        val sb = new StringBuilder
        while (v > 0) { sb += ('a' + (v % 26).toInt).toChar; v /= 26 }
        sb.result()
      }
      spark.range(2000).map { d =>
        val text = (0 until 100).map { j =>
          word((d * 100 + j) * 48271L % 20000L) }.mkString(" ")
        (d, text, "en", "syn", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$rich/documents.parquet")
    }
    val (seqRich256, tRich256) = time(
      graft.operators.Tokenizer.learnMergesIncremental(spark, rich, nMerges = 256))
    val (seqRichDist, tRichDist) = time(
      graft.operators.Tokenizer.learnMergesDistributed(spark, rich, nMerges = 256))
    println(f"[bpe] RICH corpus, incremental 256:  $tRich256%.1f s; " +
      f"re-segmenting 256: $tRichDist%.1f s; equal: ${seqRich256 == seqRichDist}")
    // SPARK_GRAFT_BPE_GROWTH=1: measure per-merge cost GROWTH instead of
    // the full-depth run — the re-segmenting trainer's ms/merge rises
    // with depth (applyMerges re-applies the whole table each pass)
    // while the incremental trainer's stays flat.
    if (sys.env.get("SPARK_GRAFT_BPE_GROWTH").contains("1")) {
      for (d <- Seq(1024)) {
        val (m1, t1) = time(
          graft.operators.Tokenizer.learnMergesDistributed(spark, rich, nMerges = d))
        println(f"[bpe] RICH growth, re-segmenting $d merges: $t1%.1f s " +
          f"(${t1 / math.max(1, m1.length) * 1000}%.1f ms/merge)")
        val (m2, t2) = time(
          graft.operators.Tokenizer.learnMergesIncremental(spark, rich, nMerges = d))
        println(f"[bpe] RICH growth, incremental   $d merges: $t2%.1f s " +
          f"(${t2 / math.max(1, m2.length) * 1000}%.1f ms/merge); equal: ${m1 == m2}")
      }
      spark.stop(); return
    }
    val (seqRichDeep, tRichDeep) = time(
      graft.operators.Tokenizer.learnMergesIncremental(spark, rich, nMerges = deep))
    println(f"[bpe] RICH corpus, incremental $deep merges: $tRichDeep%.1f s " +
      f"(${seqRichDeep.length} learned, ${
        tRichDeep / math.max(1, seqRichDeep.length) * 1000}%.1f ms/merge); " +
      s"prefix-consistent: ${seqRichDeep.take(256) == seqRich256}")
    spark.stop()
  }
}
