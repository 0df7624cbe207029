package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the super-linear 10x->20x legs the three-point scale
  * probe exposed (BENCH close r12): counts the intermediate volumes that
  * drive text_boilerplate and dedup_jaccard, at each scale dir given on
  * the command line, to separate "operator has a quadratic term" from
  * "the Caesar-scaled corpus leaks shared content across copies"
  * (translate maps [a-zA-Z] only — digit/punct-only tokens and grams are
  * IDENTICAL in every copy, so their df grows with the copy count and
  * any df-squared candidate scheme picks up a quadratic component).
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val L = 40
    args.foreach { dir =>
      val docs = graft.operators.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .where(col("len") >= L)

      // --- boilerplate volumes ---
      val grams = docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), col("len") - L)).as("p"))
        .select(col("doc_id"),
          xxhash64(col("text").substr(col("p") + 1, lit(L))).as("h"))
      val counts = grams.groupBy("h")
        .agg(count(lit(1)).as("n_occ"), countDistinct("doc_id").as("n_docs"))
      val bp = counts.agg(
        count(lit(1)).as("distinct_h"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("dup_h"),
        sum(when(col("n_occ") >= 2, col("n_occ")).otherwise(0L)).as("dup_occ"),
        max("n_occ").as("max_occ"), max("n_docs").as("max_docs")).head()
      println(s"[diag] $dir boilerplate: distinct_h=${bp.getLong(0)} " +
        s"dup_h=${bp.getLong(1)} dup_occ=${bp.getLong(2)} " +
        s"max_occ=${bp.getLong(3)} max_docs=${bp.getLong(4)}")

      // --- jaccard prefix-candidate volumes ---
      val threshold = 0.85
      val sets = graft.operators.Tables.documents(spark, dir)
        .select(col("doc_id"),
          sort_array(array_distinct(transform(split(col("text"), " "),
            t => xxhash64(t)))).as("toks"))
        .withColumn("sz", size(col("toks")))
      val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
      val exploded = sets.select(col("doc_id"), col("sz"),
        explode(col("toks")).as("tok"))
      val dfCount = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
      val pref = exploded.join(dfCount, "tok")
        .groupBy("doc_id", "sz")
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ordered"))
        .select(col("doc_id"),
          explode(slice(col("ordered.tok"), lit(1), prefLen)).as("ptok"))
      val perTok = pref.groupBy("ptok").agg(count(lit(1)).as("pdf"))
      val jc = perTok.agg(count(lit(1)).as("distinct_ptok"),
        sum("pdf").as("prefix_rows"),
        sum((col("pdf") * (col("pdf") - 1) / 2).cast("long")).as("cand_pairs"),
        max("pdf").as("max_pdf")).head()
      println(s"[diag] $dir jaccard: distinct_ptok=${jc.getLong(0)} " +
        s"prefix_rows=${jc.getLong(1)} cand_pairs=${jc.getLong(2)} " +
        s"max_pdf=${jc.getLong(3)}")
      val top = perTok.orderBy(col("pdf").desc).limit(5).collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[diag] $dir jaccard top prefix-token dfs: $top")

      // --- containment volumes (r13): output pairs + candidate stream.
      // Candidate rows = Σ_tok df_prefA(tok)·df(tok) under HASH order
      // (the registered spelling's join volume); output pairs = the
      // exact relation size, so a super-linear wall leg can be split
      // into "more work per result" vs "more results" (the Caesar
      // period-26 aliasing doubles 24 of 50 copies at 50x — every doc
      // gains an identical twin and the TRUE pair relation explodes).
      val tc = 0.95
      val prefLenC = (col("sz") - ceil(lit(tc) * col("sz")) + 1).cast("int")
      val prefC = sets.select(col("sz"),
          explode(slice(col("toks"), lit(1), prefLenC)).as("ptok"))
        .groupBy("ptok").agg(count(lit(1)).as("pdf"))
      val fullC = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
      val candC = prefC.join(fullC, col("ptok") === col("tok"))
        .agg(sum(col("pdf") * col("df")).as("cand_rows")).head().getLong(0)
      val pairsC = graft.operators.Dedup
        .containmentPairsUnsorted(spark, dir, tc).count()
      println(s"[diag] $dir containment: cand_rows=$candC out_pairs=$pairsC")
    }
    spark.stop()
  }
}
