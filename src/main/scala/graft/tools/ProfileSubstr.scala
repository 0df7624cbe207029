package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-wise wall attribution for dedup_substr (round 8): which leg of
  * the L-gram anchor pipeline pays the observed 8.5 s at sf0.1. Uses
  * noop writes (the bench's materialization) — count() prunes the
  * projections under test. */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val L = 40
    def t(name: String)(df: => DataFrame): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    t("docs")(docs)
    def grams = docs.where(col("len") >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("len") - L)).as("p"))
      .select(col("doc_id"), col("p"),
        xxhash64(col("text").substr(col("p") + 1, lit(L))).as("h"))
    t("grams scan+hash")(grams)
    t("grams agg df")(grams.groupBy("h").agg(count(lit(1)).as("cnt")))
    def dup = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2).select("h")
    t("hits join")(grams.join(dup, "h").select("doc_id", "p"))
    t("full query")(graft.operators.Dedup.substrDupSpans(spark, dir, L))
    spark.stop()
  }
}
