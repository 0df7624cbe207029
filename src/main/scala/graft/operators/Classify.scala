package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document classification for curation routing — the "which domain /
  * quality bucket does this page belong to" step a training-data
  * pipeline runs corpus-wide before mixing (cf. the fastText-style
  * quality classifiers in public pipeline reports; Rocchio 1971 for the
  * centroid form).
  *
  * The model is a NEAREST-CENTROID (Rocchio) classifier trained on the
  * corpus's own `source` labels, in EXACT-INTEGER arithmetic end-to-end
  * (the [[Search]] family's rule: floats rank identically but cannot be
  * hash-compared across engines):
  *
  *   weight(c, t) = (ctf(c,t) · 10⁶) div ctot(c)   — L1-normalized
  *     class term frequency in micro-units (BIGINT floor division);
  *   score(d, c) = Σ_t tf(d,t) · weight(c,t)       — BIGINT sum;
  *   pred(d)     = argmax_c score, ties by class name ascending.
  *
  * Training and inference are the SAME plan — centroids are a
  * (class, term)-keyed aggregate, scoring is a term-keyed join back to
  * the per-doc term counts. At 100 TB: the exchanges are term-keyed
  * (bodies never move), the class dimension is small and bounded, and
  * partial aggregation collapses the (doc, class) score rows map-side.
  * Overflow bound: tf · weight ≤ 10⁶ · tf, so scores stay in int64 up
  * to ~10¹² tokens per document — any real document.
  *
  * The self-train-on-own-labels framing makes the operator
  * deterministic and self-contained at any scale factor; swapping the
  * label column (or a curated seed subset) for real routing labels
  * changes nothing structural.
  */
object Classify {

  /** Per-document predicted class + score + correctness vs the actual
    * `source` label (the model trains on all docs including the scored
    * one — plain Rocchio, stated in the Scaladoc). */
  def centroidClassify(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val labels = docs.select(col("doc_id"), col("source"))
    val ctf = tf.join(labels, "doc_id")
      .groupBy(col("source").as("cls"), col("term"))
      .agg(sum(col("tf")).as("ctf"))
    val ctot = ctf.groupBy("cls").agg(sum(col("ctf")).as("ctot"))
    val weights = ctf.join(broadcast(ctot), "cls")
      .select(col("cls"), col("term"),
        expr("(ctf * 1000000) div ctot").as("weight"))
    val scores = tf.join(weights, "term")
      .groupBy("doc_id", "cls")
      .agg(sum(col("tf") * col("weight")).as("score"))
    // argmax per doc in ONE doc-keyed aggregate: min over the
    // (-score, class) struct = max score with class-name tie-break
    val best = scores
      .groupBy("doc_id")
      .agg(min(struct((-col("score")).as("neg"), col("cls").as("pred"))).as("b"))
      .select(col("doc_id"), col("b.pred").as("pred"),
        (-col("b.neg")).as("score"))
    best.join(labels, "doc_id")
      .select(col("doc_id"), col("pred"), col("score"),
        (col("pred") === col("source")).as("is_correct"))
      .orderBy("doc_id")
  }

  /** kNN LABEL PROPAGATION — the semi-supervised labeling step of a
    * training-data pipeline: a small labeled SEED slice (here
    * vec_id % 5 == 0 with `lang` as the label; in production a
    * human-labeled sample) labels the rest of the corpus by
    * majority vote among each unlabeled vector's k nearest seed
    * embeddings (cosine; vote ties → smallest label, neighbor ties →
    * smallest id — total order, oracle-replayable). The instance-based
    * complement of [[centroidClassify]]'s parametric centroids: kNN
    * voting follows non-convex class boundaries centroids cannot.
    *
    * Plan: targets × seeds is a broadcast-seed scoring pass (the seed
    * slice is the SMALL side by construction — 20% here, a labeled
    * sample in production), top-k per target via WindowGroupLimit, a
    * map-side-combined (target, label) vote count and a per-target
    * argmax window. At 100 TB the candidate pass swaps brute scoring
    * for the IVF-pruned probe (ann_filtered's shape) without touching
    * the vote semantics. On THIS corpus the embeddings are synthetic
    * uniform directions uncorrelated with `lang`, so accuracy is
    * chance — the operator's contract is the vote arithmetic; the
    * label signal is a property of real embeddings. */
  def knnLabelPropagation(s: SparkSession, dir: String, k: Int = 5,
                          mod: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        col("doc_id") === col("vec_id"))
      .select(col("vec_id"), col("embedding").as("v"),
        norm(col("embedding")).as("nrm"), col("lang"))
    val seeds = e.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("sid"), col("v").as("sv"),
        col("nrm").as("snrm"), col("lang").as("slang"))
    val wNn = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("sid"))
    val wVote = Window.partitionBy("vec_id")
      .orderBy(col("n_votes").desc, col("pred_lang"))
    e.filter(col("vec_id") % mod =!= 0)
      .join(broadcast(seeds), lit(true))
      .select(col("vec_id"), col("slang"),
        (dot(col("v"), col("sv")) / (col("nrm") * col("snrm"))).as("cosine"),
        col("sid"))
      .withColumn("rk", row_number().over(wNn))
      .filter(col("rk") <= k)
      .groupBy(col("vec_id"), col("slang").as("pred_lang"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("pr", row_number().over(wVote))
      .filter(col("pr") === 1)
      .select(col("vec_id"), col("pred_lang"), col("n_votes"))
      .orderBy("vec_id")
  }
}
