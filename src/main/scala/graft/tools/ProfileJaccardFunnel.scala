package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline profiling aid: the jaccard prefix join's candidate funnel —
  * raw prefix-token key matches vs size-surviving vs exactly-once vs
  * verified pairs, with wall time per stage. Tells whether remaining
  * cost is prunable candidates or irreducible verify work. */
object ProfileJaccardFunnel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.85
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.functions.ArrayOps.{sortedFirstCommon, sortedIntersectCount}

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[funnel] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // Rebuild the prefix relation exactly as jaccardPairsFromSets does.
    val toks = graft.operators.Tables.documents(s, dir).select(col("doc_id"),
        sort_array(array_distinct(transform(split(col("text"), " "), x => xxhash64(x))))
          .as("toks"))
      .withColumn("sz", size(col("toks")))
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val exploded = toks.select(col("doc_id"), col("sz"), explode(col("toks")).as("tok"))
    val dfCount = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val prefix = exploded.join(dfCount, "tok")
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ordered"))
      .select(col("doc_id"), col("sz"),
        sort_array(col("ordered.tok")).as("toks"),
        sort_array(slice(col("ordered.tok"), lit(1), prefLen)).as("pref"))
      .select(col("doc_id"), col("sz"), col("toks"), col("pref"),
        explode(col("pref")).as("ptok"))
      .localCheckpoint()
    val sizeOk = least(col("a.sz"), col("b.sz")).cast("double") /
      greatest(col("a.sz"), col("b.sz")) >= threshold
    val firstShared = col("a.ptok") ===
      sortedFirstCommon(col("a.pref"), col("b.pref"))
    def j(cond: org.apache.spark.sql.Column) =
      prefix.as("a").join(prefix.as("b"), cond)
    val base = col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id")
    val nRaw = t("raw ptok matches")(j(base).count())
    val nSize = t("+ size filter")(j(base && sizeOk).count())
    val nOnce = t("+ first-shared (exactly-once)")(j(base && sizeOk && firstShared).count())
    val jac = sortedIntersectCount(col("a.toks"), col("b.toks")).cast("double") /
      (col("a.sz") + col("b.sz") - sortedIntersectCount(col("a.toks"), col("b.toks"))).cast("double")
    val nPairs = t("+ exact verify (two-walk)")(j(base && sizeOk && firstShared && jac >= threshold).count())
    val jac1 = graft.functions.ArrayOps.sortedJaccard(col("a.toks"), col("b.toks"), threshold)
    val nPairs1 = t("+ exact verify (SortedJaccard)")(j(base && sizeOk && firstShared && jac1 >= threshold).count())
    println(s"[funnel] raw=$nRaw size=$nSize once=$nOnce pairs=$nPairs pairs1=$nPairs1")
    s.stop()
  }
}
