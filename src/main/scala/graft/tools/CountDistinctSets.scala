package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: how many DISTINCT token sets the corpus has per SF — the
  * shrink factor available to a collapse-before-pairwise jaccard. */
object CountDistinctSets {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      // The REAL jaccard input (Dedup.hashedTokenSets), hashed per set —
      // an inline re-spelling here would drift if the tokenizer changes.
      val toks = graft.operators.Dedup.hashedTokenSets(s, dir)
        .select(xxhash64(col("toks")).as("h"))
      val n = toks.count(); val d = toks.distinct().count()
      println(s"[sets] $dir docs=$n distinct_token_sets=$d ratio=${n.toDouble / d}")
    }
    s.stop()
  }
}
