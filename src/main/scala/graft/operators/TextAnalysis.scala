package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table. All pure column expressions / built-in aggregates —
  * partition-parallel, codegen'd, no UDFs (the language-ID wordlists ride
  * along as a broadcast join of a literal table).
  */
object TextAnalysis {
  import Tables.documents

  private def tokens(c: Column): Column = split(c, " ")

  /** Token + char counting (whitespace tokenizer; the BPE-ish variant is
    * `regexpTokenCounts`). */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** BPE-ish sub-word token estimate: split on word boundaries AND digit
    * runs, the common pre-tokenizer shape. */
  def regexpTokenCounts(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      size(filter(split(col("text"), "\\s+|(?=[^a-zA-Z0-9])"), t => length(t) > 0))
        .cast("long").as("n_subtokens"))
      .orderBy("doc_id")

  /** Quality scoring: length/word-shape ratios combined into [0,1]. All
    * arithmetic is integer-derived double division — bit-identical across
    * engines, so the score itself is oracle-checkable. */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val nChars = length(col("text")).cast("long")
    val nWords = size(tokens(col("text"))).cast("long")
    val nSpaces = (nChars - length(regexp_replace(col("text"), " ", ""))).cast("long")
    val avgWordLen = (nChars - nSpaces).cast("double") / nWords.cast("double")
    val lenScore = least(lit(1.0), nWords.cast("double") / lit(100.0))
    val shapeScore = when(avgWordLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    d.select(col("doc_id"), nWords.as("n_words"), avgWordLen.as("avg_word_len"),
             (lenScore * shapeScore).as("quality"))
      .orderBy("doc_id")
  }

  /** Tiny per-language stopword profiles (public common-word lists). */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "et", "de", "un", "est", "que", "pour", "dans", "ne"))

  /** Language ID by stopword-hit voting: explode tokens, broadcast-join the
    * wordlist, argmax hits per doc (ties broken by language code). The
    * wordlist side is constant-size, so the only data motion is one
    * shuffle of (doc_id, lang) partial counts. */
  def languageId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wordlist = stopwordProfiles.toSeq
      .flatMap { case (lang, ws) => ws.map(w => (lang, w)) }
      .toDF("lang_cand", "word")
    val hits = documents(s, dir)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("word"))
      .join(broadcast(wordlist), "word")
      .groupBy("doc_id", "lang_cand").agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("hits").desc, col("lang_cand"))
    hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang_cand").as("predicted_lang"), col("hits"))
      .orderBy("doc_id")
  }

  /** PER-SPAN LANGUAGE SEGMENTATION — the document-level [[languageId]]
    * vote swept over fixed-width word windows, then adjacent same-vote
    * spans merged into segments (the islands trick). Multilingual web
    * documents are filtered per-SEGMENT, not per-document (a page with an
    * English boilerplate header and a German body must not be kept or
    * dropped whole), and this is that sweep: span i = words
    * [i·spanWords, (i+1)·spanWords), each span voted by stopword hits
    * (ties → lowest language code), spans with zero hits labeled 'und'
    * (unknown — the honest output for text none of the wordlists
    * recognize). Output one row per segment: (doc_id, seg_idx, lang,
    * first_span, last_span, n_spans).
    *
    * Scale shape: one token explode + constant-size broadcast wordlist
    * join + one (doc, span)-keyed aggregate; the islands pass windows
    * PARTITIONED BY doc_id over ≤ n_words/spanWords rows per doc — no
    * global window, no data-scale sort. */
  def languageSpans(s: SparkSession, dir: String,
                    spanWords: Int = 16): DataFrame = {
    import s.implicits._
    val wordlist = stopwordProfiles.toSeq
      .flatMap { case (lang, ws) => ws.map(w => (lang, w)) }
      .toDF("lang_cand", "word")
    val docs = documents(s, dir)
    val words = docs.select(col("doc_id"),
        posexplode(tokens(lower(col("text")))).as(Seq("pos", "word")))
      .withColumn("span", (col("pos") / spanWords).cast("long"))
    val hits = words.join(broadcast(wordlist), "word")
      .groupBy("doc_id", "span", "lang_cand").agg(count(lit(1)).as("hits"))
    val wv = Window.partitionBy("doc_id", "span")
      .orderBy(col("hits").desc, col("lang_cand"))
    val voted = hits.withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("span"), col("lang_cand").as("lang"))
    // span spine: EVERY span of every doc exists, voted or not — a
    // zero-hit span must surface as 'und', not vanish
    val spine = docs.select(col("doc_id"),
      explode(sequence(lit(0L),
        ((size(tokens(lower(col("text")))) - 1) / spanWords).cast("long")))
        .as("span"))
    val spans = spine.join(voted, Seq("doc_id", "span"), "left_outer")
      .withColumn("lang", coalesce(col("lang"), lit("und")))
    val wd = Window.partitionBy("doc_id").orderBy("span")
    val chg = when(lag(col("lang"), 1).over(wd).isNull ||
      lag(col("lang"), 1).over(wd) =!= col("lang"), 1).otherwise(0)
    spans.withColumn("seg_idx",
        sum(chg).over(wd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
      .groupBy("doc_id", "seg_idx")
      .agg(min("lang").as("lang"), // constant within a segment
        min("span").cast("long").as("first_span"),
        max("span").cast("long").as("last_span"),
        count(lit(1)).as("n_spans"))
      .select("doc_id", "seg_idx", "lang", "first_span", "last_span",
        "n_spans")
      .orderBy("doc_id", "seg_idx")
  }

  /** PER-LANGUAGE SUBWORD FERTILITY — the standard multilingual
    * tokenizer-quality diagnostic: subword tokens per whitespace word,
    * aggregated over each PREDICTED language ([[languageId]]'s vote, so
    * the metric works on unlabeled corpora). High-fertility languages
    * are under-served by the tokenizer (each word fragments into many
    * pieces — more sequence length, worse sample efficiency), and this
    * table is the evidence a vocab rebalance starts from. Subword
    * counts use the [[regexpTokenCounts]] pre-tokenizer; the ratio is
    * reported in exact ppm (integral div — engine-portable, no float
    * division), with the doc/word/subword totals alongside. Docs with
    * no stopword hit in any wordlist carry no language evidence and are
    * excluded (the languageId relation defines membership). One scan +
    * the languageId vote + a languages-sized aggregate. */
  def subwordFertility(s: SparkSession, dir: String): DataFrame = {
    val counts = documents(s, dir).select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_words"),
      size(filter(split(col("text"), "\\s+|(?=[^a-zA-Z0-9])"),
        t => length(t) > 0)).cast("long").as("n_subtokens"))
    languageId(s, dir).select(col("doc_id"), col("predicted_lang"))
      .join(counts, "doc_id")
      .groupBy("predicted_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("sum_words"),
        sum("n_subtokens").as("sum_subtokens"))
      .select(col("predicted_lang"), col("n_docs"), col("sum_words"),
        col("sum_subtokens"),
        expr("(sum_subtokens * 1000000) div sum_words").as("fertility_ppm"))
      .orderBy("predicted_lang")
  }

  /** Key-term extraction: each document's `k` most distinctive terms —
    * the present terms with the LOWEST corpus document frequency (the
    * integer-exact analogue of tf-idf ranking: for distinct-term sets,
    * idf ordering IS ascending-df ordering, with the term string as the
    * tie-break — no floating-point log anywhere, so the output is
    * hash-comparable across engines). One df shuffle + one token-keyed
    * join + a per-doc top-k window (WindowGroupLimit prunes map-side);
    * the df table is corpus-vocabulary-sized and AQE broadcasts it when
    * small. */
  def keyTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val toks = documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
    val dfCount = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("token"))
    toks.join(dfCount, "token")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("df"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Winnowing-style document fingerprinting: hash word 3-grams, take the
    * min hash over each sliding window of 4 shingles, keep the distinct
    * mins. Computed entirely with per-row array expressions — no explode,
    * no window shuffle: each doc is independent, so the operator scales
    * with the scan and never exchanges data (the earlier explode+window
    * formulation shuffled every shingle and spilled under memory
    * pressure). Output: per-doc fingerprint count + combined fingerprint. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    fingerprintSets(s, dir)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        array_min(col("fps")).as("min_fingerprint"))
      // sort sampling must not re-run the winnowing array pipeline
      .localCheckpoint()
      .orderBy("doc_id")

  /** Hashed word 3-grams in sequence order — the shingle stream winnowing
    * samples from (shared by [[fingerprintSets]] and [[gramSets]]).
    * Tokens hash ONCE each, then the codegen [[graft.functions.HashedNGrams]]
    * kernel chains them per gram — the interpreted transform it replaces
    * built a string per gram (concat_ws over a slice) and hashed THAT,
    * one allocation + string hash per gram per row. Gram identity is a
    * different (equally injective) hash; every oracle-checked quantity
    * is hash-invariant. */
  private def gramsExpr: Column = gramsExprAt(3)

  /** [[gramsExpr]] at an explicit width (shared by [[gramSetsAt]] and
    * the width decision's sampler). */
  private[operators] def gramsExprAt(w: Int): Column =
    graft.functions.NGramOps.hashedNGrams(
      transform(tokens(col("text")), t => xxhash64(t)), w)

  /** The full distinct fingerprint set per doc (sorted) — consumed by the
    * near-dup-overlap gate and by anyone clustering on fingerprints.
    * The window-min pass is the codegen [[graft.functions.WinnowingMins]]
    * kernel (the transform/slice/array_min spelling allocated a slice
    * per window). */
  def fingerprintSets(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    d.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"),
        gramsExpr.as("grams"))
      .select(col("doc_id"), col("n_tokens"),
        graft.functions.NGramOps.winnowingMins(col("grams"), 4).as("win_mins"))
      .select(col("doc_id"), col("n_tokens"),
        sort_array(array_distinct(col("win_mins"))).as("fps"))
  }

  /** Repetition quality signals per document, in the style of the Gopher
    * / RefinedWeb curation rules (Rae et al. 2021 §A1.1; the rules that
    * catch boilerplate and degenerate generations):
    *   - `n_words`, `mean_word_len`
    *   - `n_types` (distinct words) and `ttr` = n_types/n_words (type-
    *     token ratio; low = repetitive)
    *   - `top_word_n` / `top_word_share` (most frequent word's share;
    *     high = degenerate)
    *   - `n_dup_2grams` / `dup_2gram_frac` (repeated word-bigram fraction
    *     — the "duplicate n-gram" rule)
    * Zero-exchange plan: one pass of per-row array kernels inside the
    * scan ([[graft.functions.SortedRunStats]] over sorted token hashes
    * does distinct-count + max-multiplicity in one walk; bigram identity
    * via the codegen [[graft.functions.HashedNGrams]] chain). Every
    * oracle-checked quantity is invariant under any injective token/gram
    * hash, so DuckDB recomputes it from the strings; ratio columns divide
    * the same integers in both engines (bit-identical doubles). */
  def gopherSignals(s: SparkSession, dir: String): DataFrame =
    withGopherSignals(documents(s, dir))
      .select("doc_id", "n_words", "mean_word_len", "n_types", "ttr",
        "top_word_n", "top_word_share", "n_dup_2grams", "dup_2gram_frac")
      .orderBy("doc_id")

  /** The signal computation over ANY relation with a `text` column
    * (batch table or stream — it is a stateless projection), appending
    * the signal columns and keeping everything else: the streaming
    * quality monitor carries event time and source through it. */
  private[graft] def withGopherSignals(df: DataFrame): DataFrame = {
    import graft.functions.ArrayOps.sortedRunStats
    val toks = tokens(col("text"))
    val th = transform(toks, t => xxhash64(t))
    df.withColumn("n_words", size(toks).cast("long"))
      // single-space tokenization: total word chars = chars - separators
      .withColumn("word_chars", (length(col("text")) - (size(toks) - 1)).cast("long"))
      .withColumn("wstats", sortedRunStats(sort_array(th)))
      // docs with <2 words have no bigrams (HashedNGrams pads short docs
      // with one gram over what is there — excluded here)
      .withColumn("gstats", when(size(toks) >= 2,
          sortedRunStats(sort_array(graft.functions.NGramOps.hashedNGrams(th, 2))))
        .otherwise(typedlit(Seq(0L, 0L))))
      .withColumn("mean_word_len", col("word_chars").cast("double") / col("n_words"))
      .withColumn("n_types", col("wstats").getItem(0))
      .withColumn("ttr", col("wstats").getItem(0).cast("double") / col("n_words"))
      .withColumn("top_word_n", col("wstats").getItem(1))
      .withColumn("top_word_share",
        col("wstats").getItem(1).cast("double") / col("n_words"))
      .withColumn("n_dup_2grams",
        greatest(col("n_words") - 1, lit(0L)) - col("gstats").getItem(0))
      .withColumn("dup_2gram_frac", when(col("n_words") >= 2,
          (greatest(col("n_words") - 1, lit(0L)) - col("gstats").getItem(0))
            .cast("double") / (col("n_words") - 1))
        .otherwise(lit(0.0)))
      .drop("word_chars", "wstats", "gstats")
  }

  /** Cross-document duplicated-gram signal (the per-document statistic
    * behind exact-substring dedup, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"): for each doc, how many
    * of its distinct word 3-grams also occur in at least one OTHER doc,
    * and the duplicated fraction. High shared_frac = boilerplate /
    * near-copy; the decontamination and removal policies key off it.
    * Plan: per-row codegen gram hashing ([[gramsExpr]]), one gram-df
    * shuffle, one gram-keyed join back, one per-doc aggregate — the df
    * table is vocabulary-scale and AQE broadcasts it when small; nothing
    * is ever all-pairs. Counts are invariant under the injective gram
    * hash, so the DuckDB oracle recomputes them from gram strings;
    * `shared_frac` divides the same integers in both engines. */
  def dupGramStats(s: SparkSession, dir: String): DataFrame = {
    val grams = documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(gramsExpr)).as("g"))
    // df counts distinct docs per gram — grams are per-doc distinct
    // already, so count(*) is the doc count.
    val gramDf = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(gramDf, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_shared_grams"),
        (col("n_shared_grams").cast("double") / col("n_grams")).as("shared_frac"))
      .orderBy("doc_id")
  }

  /** Boilerplate mining — WHAT the duplicated text actually is: the `k`
    * most frequent corpus-duplicated `L`-char windows with occurrence
    * and document counts, deterministically ranked (count desc, gram
    * asc). The diagnostic a curation team reads before tuning
    * [[graft.operators.Curation.cutDuplicatedSubstrings]]: the top rows
    * ARE the site chrome / license headers / templates the cut will
    * remove.
    *
    * Scale shape — the dedup_substr hash-gram pattern, not a gram-text
    * shuffle: the counting exchange is keyed on `xxhash64(gram)` (8-byte
    * keys; the gram expansion is ~L× corpus bytes, so shuffling L-byte
    * strings is ~7× the exchange volume at any scale). Gram TEXT moves
    * only for the survivors: the k-th largest `n_occ` among duplicated
    * hashes (one TakeOrdered over 8-byte rows → a 1-row collect) is the
    * admission threshold; every hash at-or-above it — k plus boundary
    * ties, so the exact (n_occ desc, gram asc) order is preserved — is
    * broadcast back into a second gram pass that recovers the string
    * map-side. The single-distinct doc count rides Spark's expand
    * rewrite inside the hash aggregate (the
    * [[graft.operators.Multimodal.dupFrames]] precedent); the rank
    * window runs over the k survivors only. Same
    * explode-then-O(L)-projection generation and explicit-parallelism
    * repartition as [[graft.operators.Dedup]]'s anchor relation. */
  def boilerplate(s: SparkSession, dir: String, L: Int = 40,
                  k: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val base = documents(s, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .where(col("len") >= L)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    def gramPass(cols: Column*): DataFrame = base
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("len") - L)).as("p"))
      .select(col("doc_id"), col("text").substr(col("p") + 1, lit(L)).as("gram"))
      .select(cols: _*)
    val counts = gramPass(xxhash64(col("gram")).as("h"), col("doc_id"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_occ") >= 2)
      .persist(StorageLevel.MEMORY_AND_DISK) // reused: threshold + survivor cut
    try {
      val kth = counts.orderBy(col("n_occ").desc).limit(k)
        .agg(min("n_occ").as("t")).collect() // 1 row — control-plane
      if (kth.isEmpty || kth.head.isNullAt(0))
        return counts.sparkSession.emptyDataFrame
          .select(lit(0L).as("rk"), lit("").as("gram"),
            lit(0L).as("n_occ"), lit(0L).as("n_docs")).where(lit(false))
      // Eagerly materialized (k + boundary ties rows) so the returned —
      // still lazy — plan never recomputes the counts aggregate after
      // the unpersist below.
      val survivors = counts.where(col("n_occ") >= kth.head.getLong(0))
        .localCheckpoint()
      val w = Window.orderBy(col("n_occ").desc, col("gram"))
      gramPass(col("gram"))
        .join(broadcast(survivors), xxhash64(col("gram")) === col("h"))
        .groupBy("h", "n_occ", "n_docs")
        // A 64-bit collision among survivors would silently merge two
        // distinct grams' counts into one row; min/max over the group is
        // a free output-time detector (both already ride the aggregate),
        // and raise_error turns the ~n²/2⁶⁵ event into a loud failure
        // instead of a quietly wrong top-k.
        .agg(min("gram").as("gmin"), max("gram").as("gmax"))
        .select(col("h"), col("n_occ"), col("n_docs"),
          when(col("gmin") === col("gmax"), col("gmin"))
            .otherwise(raise_error(concat(
              lit("xxhash64 collision on boilerplate gram hash "), col("h"),
              lit(": '"), col("gmin"), lit("' vs '"), col("gmax"), lit("'"))))
            .as("gram"))
        .orderBy(col("n_occ").desc, col("gram")).limit(k)
        .withColumn("rk", row_number().over(w).cast("long"))
        .select("rk", "gram", "n_occ", "n_docs")
        .orderBy("rk")
    } finally { counts.unpersist(); () }
  }

  /** Corpus vocabulary heavy hitters: the `k` most frequent tokens with
    * total term frequency and document frequency, deterministically
    * ranked (tf desc, token asc — token is unique, so the ordering is
    * total). The step a pipeline runs before building stopword lists,
    * tokenizer merges, or frequency-based filters.
    *
    * Scale shape: per-(doc, token) counts first (one keyed shuffle with
    * map-side partial aggregation), then per-token totals (vocabulary-
    * scale shuffle) — tf is a sum and df a count over rows that are
    * already distinct per doc, so no distinct-aggregate Expand ever
    * materializes doc_id × token twice. The top-k itself is
    * TakeOrderedAndProject (per-partition heads + one merge, never a
    * global sort); the rank window runs over the k survivors only. */
  def vocabTopK(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val perDoc = documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val vocab = perDoc.groupBy("token")
      .agg(sum("c").as("tf"), count(lit(1)).as("df"))
    val w = Window.orderBy(col("tf").desc, col("token"))
    vocab.orderBy(col("tf").desc, col("token")).limit(k)
      .withColumn("rk", row_number().over(w).cast("long"))
      .orderBy("rk")
  }

  /** Collocation mining: the `k` adjacent word pairs most associated by
    * PMI among pairs seen at least `minCount` times — the phrase /
    * multi-word-expression induction step (Church & Hanks 1990) a
    * tokenizer or phrase-table build runs over the corpus. PMI =
    * log(p_ab/(p_a·p_b)) is monotone in c_ab/(c_a·c_b) for a fixed
    * corpus, so the ranking uses that raw ratio — a division of exact
    * integers, bit-identical in both engines — and never computes a log
    * (whose libm could differ); ties break by the pair text.
    *
    * Plan: one bigram-count shuffle (map-side combined), one unigram-
    * count shuffle (vocabulary-scale, AQE broadcasts it for the two
    * joins back), TakeOrdered top-k. Bigrams keep WORD ORDER — this is
    * sequence analysis, not set analysis. */
  def collocations(s: SparkSession, dir: String, k: Int = 20,
                   minCount: Long = 5): DataFrame = {
    val toks = tokens(col("text"))
    // `ts` is materialized BELOW the Generate and every expression above
    // refers to it by ATTRIBUTE: projecting `toks.as("ts")` (an expression)
    // in the same select as the posexplode made the Generate carry raw
    // `text` and re-run split() once per exploded token row — O(n²) per
    // document, the same explode-the-expression trap as round 5's ann_lsh
    // ([[Similarity.lshBuckets]] documents the rule).
    val pairs = documents(s, dir)
      .withColumn("ts", toks)
      .select(col("ts"), posexplode(when(size(col("ts")) >= 2,
        slice(col("ts"), lit(1), size(col("ts")) - 1))
        .otherwise(typedlit(Seq.empty[String])))
        .as(Seq("i", "w1")))
      .select(col("w1"), element_at(col("ts"), col("i") + 2).as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = documents(s, dir)
      .select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("score").desc, col("w1"), col("w2"))
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        (col("c_ab").cast("double") / (col("c_a") * col("c_b")).cast("double"))
          .as("score"))
      .orderBy(col("score").desc, col("w1"), col("w2")).limit(k)
      .withColumn("rk", row_number().over(w).cast("long"))
      .orderBy("rk")
  }

  /** Bigram-LM typicality scoring — the CCNet idea (score text against a
    * language model of the corpus, filter the tails) in exact-integer
    * form: the corpus's own adjacent-bigram counts ARE the model, and a
    * document's score is the sum of its bigrams' corpus counts. High
    * typicality = generic, template-like text; low = novel or noisy —
    * both tails are curation signals. `typicality` is the per-bigram
    * mean scaled to stay integral ((sum·10^6) div n), so scores are
    * engine-reproducible bit-for-bit — a log-prob LM ranks the same
    * docs but its doubles cannot be hash-compared across libm
    * implementations.
    *
    * Plan shape: the exploded bigram relation is materialized ONCE
    * (localCheckpoint) and feeds both the count aggregate and the
    * re-join; the join and both aggregates are bigram-/doc-keyed — at
    * 100 TB the bigram keys would ride as xxhash64 of the pair (the
    * string keys here keep the DuckDB oracle exact; collision-free
    * hashing changes no count). */
  def lmTypicality(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    // same explode-the-ATTRIBUTE idiom as [[collocations]]
    val pairRows = documents(s, dir)
      .withColumn("ts", toks)
      .select(col("doc_id"), col("ts"), posexplode(when(size(col("ts")) >= 2,
        slice(col("ts"), lit(1), size(col("ts")) - 1))
        .otherwise(typedlit(Seq.empty[String])))
        .as(Seq("i", "w1")))
      .select(col("doc_id"), col("w1"), element_at(col("ts"), col("i") + 2).as("w2"))
      .localCheckpoint()
    val counts = pairRows.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    pairRows.join(counts, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("c_ab")).as("sum_bf"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_bf"),
        expr("(sum_bf * 1000000) div n_bigrams").as("typicality"))
      .orderBy("doc_id")
  }

  /** Distinct sorted 3-gram shingle sets per doc, shaped like
    * [[Dedup]]'s hashed token sets (doc_id, toks, sz) so the prefix-join
    * pair machinery applies unchanged. Gram-set jaccard is SEQUENCE-level
    * similarity — the right ground truth for fingerprint overlap (token-SET
    * similarity is a different category: on a tiny vocabulary, docs with
    * identical token sets can have unrelated word order and share zero
    * sequence fingerprints). */
  def gramSets(s: SparkSession, dir: String): DataFrame =
    gramSetsAt(s, dir, 3)

  /** [[gramSets]] at an explicit shingle width — the relation behind
    * [[Dedup.chooseShingleWidth]]'s decision (r16): the width stops
    * being a fixture constant and becomes the engine-derived value for
    * the corpus at hand. Width 3 remains the manual spelling every
    * pre-r16 pin uses. */
  def gramSetsAt(s: SparkSession, dir: String, width: Int): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        sort_array(array_distinct(gramsExprAt(width))).as("toks"))
      .withColumn("sz", size(col("toks")))

  /** Flesch reading-ease per document, in EXACT integer micro-units —
    * the classic readability axis of a quality-scoring pass
    * ([[qualityScores]] measures repetition/shape; this measures
    * sentence and word complexity). Heuristics, spelled identically in
    * both engines: sentences = maximal [.!?]+ runs (min 1), words =
    * non-empty whitespace tokens, syllables = maximal [aeiouy]+ vowel
    * runs per lowercased word (min 1 — "xyz" is one syllable, the
    * standard floor). Score = the Flesch formula with its constants in
    * micro-units and both ratios as FLOOR integer divisions, so the row
    * is BIGINT end-to-end — no libm, no float accumulation, hash-exact
    * across engines (the BM25/PMI rule).
    *
    * Plan: ONE zero-exchange projection — word filtering, per-word
    * vowel-run counting and the two ratios all run inside
    * `filter`/`transform`/`aggregate` higher-order lambdas over the
    * split array, so nothing explodes into a row-multiplying Generate
    * and nothing shuffles; the scan dominates at any scale. Wordless
    * documents are dropped (their ratios are undefined; both engines
    * filter identically). */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val ws = filter(split(lower(col("text")), " "), w => length(w) > 0)
    documents(s, dir)
      .select(col("doc_id"),
        greatest(lit(1L), size(regexp_extract_all(lower(col("text")),
          lit("[.!?]+"), lit(0))).cast("long")).as("n_sentences"),
        size(ws).cast("long").as("n_words"),
        aggregate(
          transform(ws, w => greatest(lit(1), size(regexp_extract_all(w,
            lit("[aeiouy]+"), lit(0)))).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("n_syllables"),
        (lit(206835000L) - expr("(1015000 * n_words) div n_sentences")
          - expr("(84600000 * n_syllables) div n_words")).as("fre_micro"))
      .orderBy("doc_id")
  }

  /** FEATURE HASHING (the "hashing trick") — the fixed-width
    * vocabulary-free featurizer classifiers and dedup sketches feed
    * from: token → bucket ⌊md5(token)[0:8] mod D⌋, no dictionary, no
    * training pass, collisions by design. Output: the corpus-level
    * bucket histogram (token mass + distinct-token load per bucket) —
    * the collision profile that tells you whether D is sized right
    * before you commit a model to it. md5's first 8 hex digits are the
    * engine-portable hash (the snapshot-digest convention): both engines
    * parse the identical hex prefix, so bucket ids hash-match exactly —
    * a seeded xxhash here would be faster per row but unverifiable.
    *
    * Scale shape: one scan → explode → (bucket, token) map-side-combined
    * distinct aggregate → a D-key rollup. The bucket domain is a
    * constant (D=64), so every post-explode exchange is bounded; the
    * distinct count is exact (two-phase aggregate), not sketched. */
  def featureHash(s: SparkSession, dir: String, d: Int = 64): DataFrame =
    documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("bucket",
        expr(s"cast(conv(substr(md5(token), 1, 8), 16, 10) as bigint) % $d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("n_distinct"))
      .orderBy("bucket")
}
