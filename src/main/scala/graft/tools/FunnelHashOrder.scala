package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Companion to ProfileJaccardFunnel: candidate counts under the
  * HASH-ORDER prefix (no df ordering) for the same word-token join. */
object FunnelHashOrder {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.85
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.functions.ArrayOps.sortedFirstCommon
    val toks = graft.operators.Tables.documents(s, dir).select(col("doc_id"),
        sort_array(array_distinct(transform(split(col("text"), " "), x => xxhash64(x))))
          .as("toks"))
      .withColumn("sz", size(col("toks")))
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefix = toks.select(col("doc_id"), col("sz"), col("toks"),
        slice(col("toks"), lit(1), prefLen).as("pref"))
      .select(col("doc_id"), col("sz"), col("toks"), col("pref"),
        explode(col("pref")).as("ptok"))
      .localCheckpoint()
    val sizeOk = least(col("a.sz"), col("b.sz")).cast("double") /
      greatest(col("a.sz"), col("b.sz")) >= threshold
    val firstShared = col("a.ptok") ===
      sortedFirstCommon(col("a.pref"), col("b.pref"))
    val base = col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id")
    def j(c: org.apache.spark.sql.Column) = prefix.as("a").join(prefix.as("b"), c)
    println(s"[funnel-h] raw=${j(base).count()} size=${j(base && sizeOk).count()} " +
      s"once=${j(base && sizeOk && firstShared).count()}")
    s.stop()
  }
}
