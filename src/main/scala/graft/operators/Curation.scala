package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond dedup/similarity: benchmark
  * decontamination, token-budget chunking, deterministic stratified
  * sampling, and concat-and-split sequence packing — the remaining steps
  * a real LLM data pipeline runs between "raw corpus" and "training
  * shards". All deterministic (no RNG, no timestamps) so every operator
  * is DuckDB-oracle-checkable, and every exchange is keyed — nothing here
  * broadcasts an O(corpus) set or sorts the world in one partition.
  */
object Curation {
  import Tables.documents

  /** Train/eval n-gram decontamination: flags every training document
    * that shares at least one distinct word 3-gram with the held-out eval
    * split (here the deterministic `doc_id % 100 == 0` slice — in
    * production the eval side is the benchmark suite). Output: the
    * contaminated doc ids with how many distinct grams they share.
    *
    * Plan shape: both sides explode their DISTINCT gram sets (reusing
    * [[TextAnalysis.gramSets]]' hashed shingles), the eval side is
    * deduped to one row per gram, and contamination is one equi-join on
    * the 8-byte gram hash + one count per doc — shuffle bounded by gram
    * multiplicity, never by pair enumeration. At 100 TB the eval side is
    * a benchmark suite (tiny) and AQE broadcasts it on its own; no
    * explicit broadcast hint so a huge holdout degrades to a keyed
    * shuffle join instead of OOMing the executors. */
  def decontaminate(s: SparkSession, dir: String, evalMod: Int = 100): DataFrame = {
    val grams = TextAnalysis.gramSets(s, dir)
      .select(col("doc_id"), explode(col("toks")).as("gram"))
    val evalGrams = grams.filter(col("doc_id") % evalMod === 0)
      .select("gram").distinct()
    grams.filter(col("doc_id") % evalMod =!= 0)
      .join(evalGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** Token-budget chunking: split each document into consecutive chunks
    * of at most `chunkTokens` whitespace tokens (context-window prep).
    * Pure per-row array expressions — the operator never exchanges data;
    * it scales with the scan exactly like a projection. */
  def docChunks(s: SparkSession, dir: String, chunkTokens: Int = 64): DataFrame = {
    val toks = split(col("text"), " ")
    val nChunks = ceil(size(toks).cast("double") / chunkTokens).cast("int")
    documents(s, dir)
      .select(col("doc_id"), toks.as("toks"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => slice(col("toks"), i * chunkTokens + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", col("chunk")).as("chunk_text"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic stratified sampling: up to `perGroup` docs per
    * language, chosen by an LCG permutation of doc_id (seedless RNG-free
    * pseudo-shuffle — the same rows come back on every run and on every
    * engine, which is what makes a 100-TB sampling job resumable and its
    * output diffable). One shuffle (the per-group window).
    *
    * Scale note: rank-within-group sorts each group; for quota ≪ group
    * size on huge groups, pre-filter with an approximate key threshold
    * (quantile of the LCG key) first, then rank the survivors — same
    * output, bounded sort. Not needed at bench scale. */
  /** The shared deterministic pseudo-shuffle key (LCG permutation of
    * doc_id); [[lcgKeySql]] is its DuckDB spelling — one definition each
    * side so operator and oracle cannot drift. */
  /* doc_id is reduced mod 2^31 BEFORE the multiply: (a mod m)*c + b ≡
   * a*c + b (mod m), so the key is unchanged, but the intermediate stays
   * ≤ (2^31-1)*1103515245 < 2^63 for any doc_id — a raw multiply wraps
   * silently in Spark (and errors in DuckDB) past doc_id ≈ 8.4e9, i.e.
   * within billion-doc range. */
  private[graft] def lcgKey: org.apache.spark.sql.Column =
    ((col("doc_id") % 2147483648L) * 1103515245L + 12345L) % 2147483648L
  private[graft] val lcgKeySql: String =
    "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648"

  /** Deterministic global training-order shuffle into `nShards` shards —
    * the "shuffle before sharding" step every training-data export runs
    * last: each document gets a shard and a position inside it, both
    * pure functions of doc_id (the shared LCG permutation), so the
    * training order is reproducible, resumable and engine-diffable with
    * no RNG state anywhere. Shard = LCG key mod nShards (uniform since
    * the permutation is), position = rank of the key within the shard.
    *
    * Scale shape: ONE exchange keyed on shard, then per-shard sorts —
    * never a global row_number (whose single-partition window is the
    * classic driver-sized-sort trap); nShards at 100 TB is thousands,
    * so each sort is a shard, not the corpus. */
  def shuffleShards(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(lcgKey, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), (lcgKey % nShards).cast("long").as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .orderBy("shard", "pos")
  }

  def sampleStratified(s: SparkSession, dir: String, perGroup: Int = 50): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(lcgKey, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perGroup)
      .orderBy("lang", "rk")
  }

  /** Per-source quotas for [[mixSources]], shared with the oracle SQL so
    * the two can never drift (the synthetic corpus has sources
    * src0..src4; src3 is deliberately over-asked to exercise the
    * quota > group-size case). */
  val mixQuotas: Seq[(String, Int)] = Seq(
    "src0" -> 40, "src1" -> 20, "src2" -> 10, "src3" -> 1000, "src4" -> 5)

  /** Weighted source mixing: draw up to a per-source quota of documents,
    * deterministically (same LCG pseudo-shuffle as [[sampleStratified]]) —
    * the "data mixing" step that rebalances a crawl-heavy corpus toward
    * target source proportions. A quota larger than the source takes the
    * whole source (no error, matching how mixing configs are written).
    * One shuffle (the per-source window; WindowGroupLimit prunes
    * map-side); the quota table is a literal — never a collected
    * DataFrame. */
  def mixSources(s: SparkSession, dir: String,
                 quotas: Seq[(String, Int)] = mixQuotas): DataFrame = {
    import s.implicits._
    val q = quotas.toDF("source", "quota")
    val w = Window.partitionBy("source").orderBy(lcgKey, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      // literal rank bound FIRST: it turns the window into a map-side-
      // pruned WindowGroupLimit; the exact per-source quota then applies
      // after the (broadcast) join against the literal quota table.
      // maxOption: an empty mixing config means zero rows, not empty.max.
      .filter(col("rk") <= quotas.map(_._2).maxOption.getOrElse(0))
      .join(q, "source")
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("source", "rk")
  }

  /** DSIR-style domain-affinity scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", linearized to exact
    * integers): score each document by how much its bigram distribution
    * looks like a TARGET domain (here the `targetSource` slice of the
    * corpus — in production the target is a small in-domain seed set).
    * Per-bigram weight = ((c_target + 1) · 10⁶) div (c_corpus + 1) — the
    * add-one-smoothed target/corpus frequency ratio in micro-units — and
    * a document's affinity is the SUM of its bigram-occurrence weights:
    * the log-linearized form of DSIR's importance weight Π (p̂/q̂)^count,
    * order-preserving for resampling, and BIGINT end-to-end so the oracle
    * hash-matches (the real log-space weight ranks identically but its
    * doubles are not cross-libm comparable). Docs with < 2 tokens have no
    * bigrams and drop out — they carry no evidence either way.
    *
    * Plan shape mirrors [[TextAnalysis.lmTypicality]]: the exploded
    * bigram relation is materialized ONCE and feeds both the count
    * aggregate and the re-join; everything exchanges on the bigram /
    * doc key. At 100 TB the bigram keys ride as xxhash64 (string keys
    * here keep the DuckDB oracle exact; collision-free hashing changes
    * no count) and the target seed's gram table is tiny — but no
    * broadcast hint, so a large target degrades to a keyed join. */
  def dsirAffinity(s: SparkSession, dir: String,
                   targetSource: String = "src0"): DataFrame = {
    val toks = split(col("text"), " ")
    // explode-the-ATTRIBUTE idiom (see lmTypicality): `ts` is projected
    // below the Generate, never re-evaluated per bigram row
    val pairRows = documents(s, dir)
      .withColumn("ts", toks)
      .select(col("doc_id"), col("source"), col("ts"),
        posexplode(when(size(col("ts")) >= 2,
          slice(col("ts"), lit(1), size(col("ts")) - 1))
          .otherwise(typedlit(Seq.empty[String])))
          .as(Seq("i", "w1")))
      .select(col("doc_id"), col("source"), col("w1"),
        element_at(col("ts"), col("i") + 2).as("w2"))
      .localCheckpoint()
    val weights = pairRows.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("c_tgt"))
      .select(col("w1"), col("w2"),
        expr("((c_tgt + 1) * 1000000) div (c_all + 1)").as("w"))
    pairRows.join(weights, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w")).as("affinity_micro"))
      .orderBy("doc_id")
  }

  /** Per-domain document cap (the Gopher/C4 "limit documents per
    * domain/source" crawl-balancing rule): keep at most `cap` documents
    * from EVERY source, chosen by the same deterministic LCG
    * pseudo-shuffle as [[sampleStratified]] so the survivors are an
    * unbiased-but-reproducible draw rather than a doc_id-prefix artifact.
    * Unlike [[mixSources]] (an explicit per-source quota TABLE for
    * rebalancing toward target proportions), the cap is uniform and
    * config-free — the defensive pass a crawl pipeline runs BEFORE mixing
    * so one domain's millions of pages cannot dominate any downstream
    * draw. Output: survivors with their source and draw rank.
    *
    * One shuffle total: the literal rank bound turns the per-source
    * window into a map-side-pruned WindowGroupLimit — at 100 TB each
    * executor forwards at most `cap` rows per source it scans, so the
    * exchange carries O(sources · cap), not the corpus. */
  def domainCap(s: SparkSession, dir: String, cap: Int = 10): DataFrame = {
    val w = Window.partitionBy("source").orderBy(lcgKey, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .orderBy("source", "rk")
  }

  /** PII patterns: (count-column suffix, regex, redaction tag). The
    * regexes are deliberately restricted to the dialect intersection of
    * Java `Pattern` (Spark codegen) and RE2 (DuckDB, Go tooling): no
    * backreferences, no lookaround — so the operator and its oracle can
    * never disagree on what a match is, and the same patterns port to
    * whatever scrubbing tools audit the output downstream. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phones", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** PII detection + redaction over any text column: appends one
    * `n_<kind>` count per pattern and `redacted_text` with every match
    * replaced by its tag, applied in [[piiPatterns]] order (tags contain
    * no digits or `@`, so later patterns cannot match inside earlier
    * replacements). Pure per-row regex expressions — codegen'd, zero
    * exchange, scales with the scan like a projection; this is the shape
    * a 100-TB scrub pass must have, because anything that shuffles the
    * text itself pays the corpus twice. */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withCounts = piiPatterns.foldLeft(df) { case (acc, (name, re, _)) =>
      acc.withColumn(s"n_$name", regexp_count(col(textCol), lit(re)).cast("long"))
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) { case (c, (_, re, tag)) =>
      regexp_replace(c, re, tag)
    }
    withCounts.withColumn("redacted_text", redacted)
  }

  /** The `curate_pii` query: the synthetic corpus carries no natural
    * PII, so the query derives a deterministic PII-bearing variant of
    * each document (emails / IPs / phone numbers keyed off doc_id, with
    * per-kind presence varying by residue so counts differ across docs
    * and some docs carry two emails) and scrubs THAT. The derivation is
    * spelled identically in the DuckDB oracle, so the redacted text and
    * all counts hash-compare exactly. */
  def piiDemo(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val enriched = documents(s, dir).select(col("doc_id"), concat(
      col("text"),
      when(id % 3 === 0, concat(lit(" contact user"), str(id),
        lit("@ex"), str(id % 7), lit(".com"))).otherwise(lit("")),
      when(id % 4 === 1, concat(lit(" backup admin"), str(id),
        lit("@host.example.org"))).otherwise(lit("")),
      when(id % 2 === 0, concat(lit(" from "), str(id % 224 + 1),
        lit(".0."), str(id % 100), lit(".1"))).otherwise(lit("")),
      when(id % 5 === 1, concat(lit(" tel 555-"), lpad(str(id % 1000), 3, "0"),
        lit("-"), lpad(str(id % 10000), 4, "0"))).otherwise(lit(""))
    ).as("text"))
    piiScrub(enriched)
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("redacted_text"))
      .orderBy("doc_id")
  }

  /** URL canonicalization — the crawl-pipeline step that runs BEFORE any
    * URL-keyed dedup, because raw crawl URLs name the same resource a
    * dozen ways (case-insensitive scheme/host, default ports, tracking
    * params, fragments, trailing slashes) and deduping on the raw string
    * misses all of them. Rules, in order: (1) drop the fragment;
    * (2) lowercase scheme://host[:port] (the case-insensitive part of a
    * URL — the path stays case-SENSITIVE); (3) drop default ports
    * (http :80, https :443 — explicit non-defaults stay); (4) strip
    * `utm_*` tracking params, healing the leading `?` if the first
    * param was tracking; (5) drop a trailing path slash.
    *
    * Every rule is one regex/string op in the Java-Pattern∩RE2 dialect
    * (the [[piiPatterns]] convention: no lookaround, no backreferences
    * in patterns) so the DuckDB oracle applies the identical sequence;
    * the Spark side is a zero-exchange codegen projection — at 100 TB
    * the normalization itself never shuffles, only the subsequent
    * url-keyed dedup count does (here a window over `url_norm`, one
    * keyed exchange, demonstrating the collapse the rules buy). */
  def normalizeUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase exactly the scheme://host[:port] prefix
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(prefix),
      substring(noFrag, length(prefix) + 1, lit(Int.MaxValue)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    val noUtm = regexp_replace(noPort, "[?&]utm_[^&#]*", "")
    // first surviving param kept its own '&': heal it to '?' (the
    // character class guarantees we touch the FIRST separator only)
    val healed = regexp_replace(
      regexp_replace(noUtm, "^([^?&]*)&", "$1?"), "[?&]$", "")
    regexp_replace(regexp_replace(healed, "/\\?", "?"), "/$", "")
  }

  /** The `curate_urlnorm` query: the synthetic corpus carries no URL
    * column, so (the [[piiDemo]] precedent) a deterministic messy URL is
    * derived per doc_id — mixed-case scheme/host, default and explicit
    * ports, tracking params in first and later positions, fragments,
    * trailing slashes — and normalized. `n_same_norm` counts docs
    * sharing the canonical form (the dedup key the rules exist to
    * create); the derivation and every rule are spelled identically in
    * the oracle, so url_norm and the counts hash-compare exactly. */
  def urlNormDemo(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val url = concat(
      when(id % 2 === 0, "HTTP://").otherwise("https://"),
      lit("WWW.Site"), str(id % 7), lit(".Example.COM"),
      when(id % 3 === 0, ":80").when(id % 3 === 1, ":443").otherwise(":8080"),
      lit("/Docs/Page"), str(id % 5),
      when(id % 4 === 0, "/").otherwise(""),
      when(id % 2 === 0, concat(lit("?utm_source=feed&id="), str(id % 10)))
        .when(id % 5 === 1, concat(lit("?id="), str(id % 10), lit("&utm_campaign=x")))
        .otherwise(lit("")),
      when(id % 6 === 0, concat(lit("#sec"), str(id % 3))).otherwise(lit("")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("url_norm")
    documents(s, dir)
      .select(col("doc_id"), url.as("url"))
      .withColumn("url_norm", normalizeUrl(col("url")))
      .withColumn("n_same_norm", count(lit(1)).over(w))
      .orderBy("doc_id")
  }

  /** Gopher/RefinedWeb-style document quality filter: the APPLY step over
    * [[TextAnalysis.gopherSignals]] — a keep/drop decision plus the FIRST
    * failing rule as `drop_reason` (rules are checked in a fixed order,
    * so the reason is deterministic and the reason histogram is a
    * meaningful pipeline dashboard). Thresholds are parameters; the
    * defaults discriminate on the synthetic corpus (each rule fires on
    * some docs) and sit in the published Gopher ranges. Inherits the
    * signals' zero-exchange plan — the filter itself is a projection.
    *
    * Every signal compared against a threshold is a division of the same
    * integers in both engines (bit-identical IEEE doubles), so the
    * boolean and the reason string are oracle-checkable — no epsilon. */
  /** The rule chain as a Column over the signal columns — shared by the
    * batch filter and the streaming quality monitor so thresholds and
    * rule ORDER can never drift between them. */
  private[graft] def qualityReason(minWords: Long = 30, maxWords: Long = 5000,
                                   minMeanWordLen: Double = 3.0,
                                   maxMeanWordLen: Double = 10.0,
                                   minTtr: Double = 0.35, maxTopShare: Double = 0.15,
                                   maxDupFrac: Double = 0.10): org.apache.spark.sql.Column =
    when(col("n_words") < minWords, "too_short")
      .when(col("n_words") > maxWords, "too_long")
      .when(col("mean_word_len") < minMeanWordLen ||
        col("mean_word_len") > maxMeanWordLen, "word_shape")
      .when(col("ttr") < minTtr, "repetitive_types")
      .when(col("top_word_share") > maxTopShare, "top_word_dominates")
      .when(col("dup_2gram_frac") > maxDupFrac, "duplicate_bigrams")
      .otherwise("ok")

  def qualityFilter(s: SparkSession, dir: String,
                    minWords: Long = 30, maxWords: Long = 5000,
                    minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                    minTtr: Double = 0.35, maxTopShare: Double = 0.15,
                    maxDupFrac: Double = 0.10): DataFrame = {
    val reason = qualityReason(minWords, maxWords, minMeanWordLen,
      maxMeanWordLen, minTtr, maxTopShare, maxDupFrac)
    TextAnalysis.gopherSignals(s, dir)
      .select(col("doc_id"), col("n_words"), col("ttr"), col("top_word_share"),
        col("dup_2gram_frac"), reason.as("drop_reason"),
        (reason === "ok").as("kept"))
      .orderBy("doc_id")
  }

  /** Deterministic train/validation/test splitting: each document's
    * split is a pure function of its id (the shared [[lcgKey]]
    * pseudo-shuffle reduced mod 1000 against cumulative per-mille
    * thresholds), so the assignment is stable across runs, engines,
    * partitionings, and corpus growth — adding documents never
    * reshuffles existing ones between splits, which is the property
    * that keeps eval sets uncontaminated over a pipeline's lifetime.
    * Zero-exchange projection; one lcgKey/lcgKeySql definition on both
    * sides, so operator and oracle cannot drift. */
  def splitAssignments(s: SparkSession, dir: String,
                       trainPerMille: Int = 900,
                       validPerMille: Int = 50): DataFrame = {
    val bucket = lcgKey % 1000
    documents(s, dir).select(col("doc_id"), bucket.as("bucket"),
        when(bucket < trainPerMille, "train")
          .when(bucket < trainPerMille + validPerMille, "valid")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Two-phase ANNEAL schedule — the data side of the late-training
    * "anneal" recipe (train on the full filtered mix, then spend the
    * final fraction of the token budget on an upweighted high-quality
    * subset; the practice published for MiniCPM and Llama-3-style
    * runs). The anneal set is selected by an ABSOLUTE quality bar, not
    * a global rank: a rank needs a corpus-wide sort/window at 100 TB,
    * while a threshold (in production, a quality-classifier score
    * cutoff; here, the Gopher TTR signal the filter chain already
    * computes) keeps this a zero-exchange projection AND keeps
    * membership stable as the corpus grows — adding documents never
    * evicts existing ones from the anneal set, the same stability
    * argument as [[splitAssignments]].
    *
    * Per doc: `epochs` = 0 (dropped by the phase-1 quality gate),
    * 1 (trained in phase 1 only), or 1 + `annealExtra` (also upsampled
    * in phase 2). Phase-2 membership requires passing the phase-1 gate
    * — the anneal set is a subset of the training set by construction.
    * TTR doubles are small-integer ratios, bit-identical in both
    * engines (the curate_filter convention), so the threshold compare
    * is oracle-exact. */
  def annealSchedule(s: SparkSession, dir: String,
                     minAnnealTtr: Double = 0.5,
                     annealExtra: Int = 3): DataFrame = {
    val reason = qualityReason()
    TextAnalysis.gopherSignals(s, dir)
      .select(col("doc_id"), col("ttr"), (reason === "ok").as("kept"),
        (reason === "ok" && col("ttr") >= minAnnealTtr).as("in_anneal"))
      .withColumn("epochs",
        when(!col("kept"), 0)
          .when(col("in_anneal"), 1 + annealExtra)
          .otherwise(1).cast("long"))
      .orderBy("doc_id")
  }

  /** Exact-substring span removal (the APPLY step behind
    * [[TextAnalysis.dupGramStats]]'s signal; Lee et al. 2022's dedup at
    * span rather than document granularity): every token covered by a
    * word n-gram that occurs in ≥2 DISTINCT documents is removed —
    * boilerplate and licence headers vanish from every copy while each
    * document's unique content survives. Within-doc repetition is NOT
    * touched (that is the Gopher rules' job); df counts documents.
    *
    * Plan: positional gram hashes per doc (codegen HashedNGrams, grams
    * only for docs with ≥n tokens — no padding, so position p covers
    * tokens p..p+n-1 exactly), one gram-df shuffle over DISTINCT
    * (doc, gram), one gram-keyed join back to occurrences, covered
    * positions folded per doc, and a per-row indexed filter to drop
    * them. Everything exchanges on gram hash or doc_id — never pairs.
    * The final token filter is ONE codegen merge walk per row
    * ([[graft.functions.SpanOps]], O(n + |covered|)) — the round-6
    * interpreted HOF probed the covered array per token
    * (O(n·|covered|)), quadratic on boilerplate-dominated corpora
    * where covered positions approach n. */
  def removeSharedSpans(s: SparkSession, dir: String, n: Int = 3,
                        minDf: Int = 2): DataFrame = {
    val toks = split(col("text"), " ")
    val nw = size(toks)
    val gramArr = when(nw >= n,
      graft.functions.NGramOps.hashedNGrams(
        transform(toks, t => xxhash64(t)), n))
      .otherwise(typedlit(Seq.empty[Long]))
    val occ = documents(s, dir)
      .select(col("doc_id"), posexplode(gramArr).as(Seq("pos", "g")))
    val gramDf = occ.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
    val covered = occ.join(gramDf.filter(col("df") >= minDf), "g")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("cp"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set("cp")).as("covered"))
    documents(s, dir)
      .join(covered, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), nw.cast("long").as("n_tokens"),
        coalesce(size(col("covered")), lit(0)).cast("long").as("n_removed"),
        graft.functions.SpanOps.joinTokensExcept(toks,
          coalesce(col("covered"), typedlit(Seq.empty[Int]))).as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** Concat-and-split sequence packing: lay all documents' tokens end to
    * end in doc_id order and cut every `budget` tokens — each doc reports
    * the pack it starts in and its offset there (GPT-style training-shard
    * packing; docs may straddle packs by construction).
    *
    * The global running token count is computed in TWO PHASES so no
    * executor ever sorts the corpus in one partition: doc_id-block-local
    * prefix sums (keyed window over `blockSize`-wide blocks), plus an
    * all-blocks prefix over the block TOTALS — the only single-partition
    * window in the plan. `blockSize = 0` (the default and the registered
    * spelling) sizes blocks from the CORPUS: one cheap max(doc_id)
    * column-scan, then blockSize = ⌈idRange / parallelism²⌉ — so the
    * block level is bounded at ~parallelism² rows AT ANY SCALE (a fixed
    * blockSize bounds nothing: at 10¹² docs, 1024-wide blocks put 10⁹
    * rows through the single-partition window — the classic trap this
    * operator exists to avoid, reintroduced one level up). Output is
    * invariant to blockSize by construction (the prefix sum telescopes);
    * OperatorsSpec pins equality across fixed, auto and degenerate
    * sizes. The block-offset join is keyed; AQE broadcasts the tiny side
    * on its own. */
  /** Winsorize document lengths at exact integer percentiles — outlier
    * clipping before length-sensitive downstream stages (packing, token
    * budgeting), with the cut points computed EXACTLY at any scale.
    *
    * The percentile trick: `n_chars` has a bounded integer domain, so
    * the exact p-th order statistic needs no global sort and no per-
    * group value map (contrast [[Analytics.q19Quantiles]]'s
    * `percentile`, which builds one) — a value HISTOGRAM
    * (groupBy(n_chars), vocabulary-scale shuffle) plus a cumulative sum
    * over the sorted distinct values gives every quantile at once. The
    * single-partition cumulative window runs over distinct LENGTHS, not
    * rows — bounded the way text_vocab's rank window is — and the two
    * cut points broadcast back as a 1-row crossJoin. Quantile
    * definition: smallest v with cum ≥ ceil(p·n/100), kept in integer
    * arithmetic (`100·cum ≥ p·n`) so both engines agree bit-for-bit. */
  def winsorize(s: SparkSession, dir: String, pLo: Int = 5,
                pHi: Int = 95): DataFrame = {
    val docs = documents(s, dir).select(col("doc_id"), col("n_chars"))
    val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
    val wcum = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = hist.withColumn("cum", sum("c").over(wcum))
      .crossJoin(hist.agg(sum("c").as("n")))
      .agg(
        min(when(col("cum") * 100 >= col("n") * pLo, col("n_chars"))).as("lo"),
        min(when(col("cum") * 100 >= col("n") * pHi, col("n_chars"))).as("hi"))
    docs.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_chars"),
        greatest(least(col("n_chars"), col("hi")), col("lo")).as("n_chars_w"),
        (col("n_chars") < col("lo")).as("clipped_low"),
        (col("n_chars") > col("hi")).as("clipped_high"))
      .orderBy("doc_id")
  }

  /** Corpus-derived prefix-sum block size: max doc_id over parallelism²
    * (one bounded control-plane read of a single pruned column), so the
    * block level holds ≈ parallelism² rows regardless of corpus scale.
    * Shared by [[packSequences]] and [[DocPipeline.exportTrainingUnsorted]]
    * — OperatorsSpec pins packSequences blockSize-invariant, and sharing
    * the helper extends that pin to the capstone (the two sizings used to
    * be copy-pasted and could drift). */
  private[operators] def autoBlockSize(s: SparkSession, dir: String): Long = {
    val maxId = documents(s, dir).agg(max("doc_id")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val par = s.sparkContext.defaultParallelism.toLong
    math.max(1L, maxId / (par * par) + 1)
  }

  def packSequences(s: SparkSession, dir: String, budget: Int = 256,
                    blockSize: Long = 0L): DataFrame = {
    val bs: Long =
      if (blockSize > 0) blockSize else autoBlockSize(s, dir)
    val d = documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("blk", (col("doc_id") / bs).cast("long"))
    val wLocal = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBlocks = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockPrefix = d.groupBy("blk").agg(sum("n_tokens").as("blk_total"))
      .withColumn("blk_prefix", coalesce(sum("blk_total").over(wBlocks), lit(0L)))
      .select("blk", "blk_prefix")
    d.withColumn("local_prefix", coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      .join(blockPrefix, "blk")
      .select(col("doc_id"), col("n_tokens"),
        (col("blk_prefix") + col("local_prefix")).as("cum"))
      // `div` (integral division) keeps pack_id exact past 2^53 cumulative
      // tokens — a double divide would round there, and 100-TB corpora
      // reach it. The oracle casts DuckDB's HUGEINT sum back to BIGINT so
      // both sides hash as int64.
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum div $budget").as("pack_id"),
        (col("cum") % budget).as("pack_offset"))
      .orderBy("doc_id")
  }

  /** ExactSubstr APPLY step (Lee et al. ACL 2022 §4.2) — the character-
    * level counterpart to [[removeSharedSpans]]: delete from every
    * document the union of corpus-duplicated L-char windows that
    * [[Dedup.substrDupSpans]] reports, keeping the novel text between
    * them. Share the one [[Dedup.dupGramStarts]] anchor relation, fold
    * each doc's sorted starts, and cut in ONE codegen merge walk per row
    * ([[graft.functions.SpanOps.cutCovered]], O(len) code points — the
    * [[graft.functions.SpanOps.joinExcept]] precedent at character
    * granularity).
    *
    * Output carries the CLEANED TEXT itself, so the DuckDB oracle — which
    * re-derives covered positions from raw text and reassembles the kept
    * characters with an ordered string_agg — pins the cut byte-for-byte,
    * not just its length. */
  def cutDuplicatedSubstrings(s: SparkSession, dir: String,
                              L: Int = 40): DataFrame = {
    val starts = Dedup.dupGramStarts(s, dir, L)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("p"))).as("starts"))
    documents(s, dir)
      .join(starts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        graft.functions.SpanOps.cutCoveredText(col("text"),
          coalesce(col("starts"), typedlit(Seq.empty[Int])), L)
          .as("text_clean"))
      .withColumn("n_kept", length(col("text_clean")).cast("long"))
      .orderBy("doc_id")
  }

  /** Greedy TOKEN-BUDGET selection: keep the highest-quality documents
    * whose cumulative token count fits `budget` — the "we can afford N
    * tokens of pretraining data, which documents?" step. Quality here
    * is the exact-integer type-token ratio (distinct words ·10⁶ div
    * words — the curate_anneal signal); greedy order is (ttr desc,
    * doc_id), and a document is kept iff the running total THROUGH it
    * stays within budget.
    *
    * Spelled WITHOUT a global row sort (the winsorize histogram trick,
    * applied to budgeted selection): (1) per-doc score/tokens — one
    * projection; (2) per-SCORE bucket token sums — an exchange bounded
    * by the score domain (≤ 10⁶+1 values), with the cross-bucket
    * running offset a window over that bounded domain, not over rows;
    * (3) the within-bucket cumulative sum a doc_id-keyed window
    * PARTITIONED by score. At 100 TB the only row-scale exchanges are
    * the score groupBy and the per-bucket window — no single-partition
    * global sort anywhere. Output: kept docs with their running total,
    * (ttr desc, doc_id) order. */
  def tokenBudgetSelect(s: SparkSession, dir: String,
                        budget: Long = 2048L): DataFrame = {
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val m = documents(s, dir)
      .select(col("doc_id"), size(ws).cast("long").as("n_tokens"),
        size(array_distinct(ws)).cast("long").as("n_distinct"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        expr("(n_distinct * 1000000) div n_tokens").as("ttr_micro"))
    val wScore = Window.orderBy(col("ttr_micro").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = m.groupBy("ttr_micro")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("cum_before",
        coalesce(sum("bucket_tokens").over(wScore), lit(0L)))
      .select("ttr_micro", "cum_before")
    val wDoc = Window.partitionBy("ttr_micro").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.join(offsets, "ttr_micro")
      .withColumn("cum_tokens", col("cum_before") + sum("n_tokens").over(wDoc))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("ttr_micro"),
        col("cum_tokens"))
      .orderBy(col("ttr_micro").desc, col("doc_id"))
  }

  /** Temperature-scaled source mixing weights (the multilingual /
    * multi-source LLM recipe: sample source s with probability
    * ∝ n_s^α, α = 1/2 — up-weights small sources, down-weights the
    * crawl-heavy head; α=1 is natural sampling, α=0 is uniform).
    * Output per source: its document count, its temperature weight
    * w = ⌊√n_s⌋, its resulting corpus share in micro-units
    * ⌊10⁶·w_s / Σw⌋, and its repetition boost over natural sampling
    * ⌊10⁶·(w_s/Σw)/(n_s/Σn)⌋ — the per-source epoch multiplier a
    * sampler feeds from (boost > 10⁶ means the source is repeated,
    * < 10⁶ means it is subsampled).
    *
    * Exactness: ⌊√n⌋ via IEEE double sqrt is the exact integer square
    * root for every n < 2⁵², and both ratios are exact integral
    * divisions of exact integers — the boost's w·Σn·10⁶ numerator
    * passes 2⁶³ at ~4·10⁸ documents, so it runs in decimal(38,0)
    * (DuckDB: HUGEINT) rather than BIGINT; no doubles anywhere, so the
    * row hashes match at any corpus size without float tolerance.
    * Plan: one count aggregate (5 rows at any corpus size — sources are
    * a bounded domain), a 1-row totals broadcast; no data-scale
    * exchange beyond the count. */
  /** LEAKAGE-SAFE train/valid/test split — the correctness upgrade over
    * [[splitAssignments]] every evaluation pipeline eventually needs:
    * hashing doc_id sends near-duplicate documents to DIFFERENT splits,
    * so test answers leak into training. Splitting by the near-dup
    * CLUSTER id (the [[Dedup.clusterAssignments]] transitive closure,
    * singletons = their own id) guarantees no ≥0.85-Jaccard pair ever
    * straddles a split boundary — the whole cluster moves together.
    * Same LCG permutation and 90/5/5 thresholds as curate_split, keyed
    * on cluster_id instead of doc_id (one hash definition in one place).
    *
    * Scale shape: cluster assignment is the settled prefix-filtered pair
    * artifact + iterated min-label propagation (dedup_cluster's audited
    * plan); the split itself is a zero-exchange projection over it.
    * OperatorsSpec pins the zero-straddle property pair-by-pair. */
  def leakSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val lcgCluster = lcgKeySql.replace("doc_id", "cluster_id")
    Dedup.clusterAssignments(s, dir)
      .withColumn("bucket", expr(s"($lcgCluster) % 1000"))
      .withColumn("split", when(col("bucket") < 900, "train")
        .when(col("bucket") < 950, "valid").otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")
  }

  /** SOFT DEDUPLICATION — reweight instead of remove: every document
    * keeps a training sampling weight of 1/|its near-dup cluster|, so
    * each duplicate GROUP contributes one document's worth of expected
    * training mass while no individual copy (with its unique surrounding
    * context) is discarded — the alternative to hard dedup that recent
    * data-mixing work prefers when duplicates carry signal. Clusters are
    * [[Dedup.clusterAssignments]]' audited relation (prefix-filtered
    * jaccard pairs → min-label connected components; singletons weight
    * 1.0). `weight` is the one correctly-rounded double 1.0/n both
    * engines compute identically from the exact integer `n_members`.
    *
    * Scale shape: the settled pair artifact + label propagation
    * (dedup_cluster's plan) plus ONE narrow cluster-keyed count and a
    * broadcast-back join — no new corpus-scale exchange. */
  def softDedupWeights(s: SparkSession, dir: String): DataFrame = {
    val assign = Dedup.clusterAssignments(s, dir)
    val sizes = assign.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    assign.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("n_members"),
        (lit(1.0) / col("n_members")).as("weight"))
      .orderBy("doc_id")
  }

  final case class CtxSlot(pack_id: Long, seq: Long, doc_id: Long,
                           dot_prev: Long)

  /** IN-CONTEXT PACK ORDERING — the long-context curation step after
    * packing ("related documents should share a context window", the
    * in-context-pretraining recipe): within each [[packSequences]] pack,
    * members are reordered into a greedy similarity chain — start at the
    * min doc_id, repeatedly append the unplaced member with the highest
    * embedding dot to the CURRENT document (exact integer micro-dots,
    * ⌊x·1000⌋; ties to the smallest doc_id). The emitted `dot_prev`
    * makes the chain quality auditable as data.
    *
    * The sequential dependence lives strictly INSIDE one pack, and packs
    * are bounded by the token budget (≤ budget/min_doc_tokens members),
    * so the right Spark spelling is a keyed traversal per group:
    * one exchange on pack_id, then O(|pack|²·dims) driver-free work per
    * group with O(|pack|) state — constant per pack, linear in packs.
    * The oracle replays every pack's chain as one recursive CTE
    * (embed_coreset's greedy-argmax pattern, parallel per pack). */
  def contextPackOrder(s: SparkSession, dir: String,
                       budget: Int = 256): DataFrame = {
    import s.implicits._
    val packs = packSequences(s, dir, budget).select("doc_id", "pack_id")
    val mic = Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long")).as("q"))
    packs.join(mic, "doc_id")
      .select(col("pack_id"), col("doc_id"), col("q"))
      .as[(Long, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (pid: Long, it: Iterator[(Long, Long, Seq[Long])]) =>
        val ms = it.map(t => (t._2, t._3.toArray)).toArray.sortBy(_._1)
        val n = ms.length
        val used = new Array[Boolean](n)
        val out = new scala.collection.mutable.ArrayBuffer[CtxSlot](n)
        var cur = 0
        used(0) = true
        out += CtxSlot(pid, 0L, ms(0)._1, 0L)
        var step = 1
        while (step < n) {
          var best = -1
          var bestDot = Long.MinValue
          var i = 0
          while (i < n) {
            if (!used(i)) {
              val a = ms(cur)._2; val b = ms(i)._2
              var d = 0L; var j = 0
              while (j < a.length) { d += a(j) * b(j); j += 1 }
              if (d > bestDot) { bestDot = d; best = i } // ascending ids: first wins ties
            }
            i += 1
          }
          used(best) = true
          out += CtxSlot(pid, step.toLong, ms(best)._1, bestDot)
          cur = best
          step += 1
        }
        out.iterator
      }
      .toDF()
      .orderBy("pack_id", "seq")
  }

  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val perSource = documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val totals = perSource.agg(sum("n_docs").as("tot_docs"), sum("w").as("tot_w"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("w"),
        expr("(w * 1000000) div tot_w").as("share_micro"),
        expr("(cast(w as decimal(38,0)) * tot_docs * 1000000) div " +
          "(cast(n_docs as decimal(38,0)) * tot_w)").as("boost_micro"))
      .orderBy("source")
  }
}
