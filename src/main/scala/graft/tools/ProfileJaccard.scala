package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local profiling aid (not part of the library surface): stage-by-stage
  * cost breakdown of the jaccard prefix-filter join at a given SF dir,
  * driven through the noop sink (same as Bench — count() would prune the
  * very projections being measured). */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.functions.ArrayOps.{sortedIntersectCount, sortedFirstCommon}
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.operators.Tables.documents(s, dir).count() // warm
    val threshold = 0.85
    val toks = graft.operators.Tables.documents(s, dir).select(col("doc_id"),
      sort_array(array_distinct(transform(split(col("text"), " "), x => xxhash64(x))))
        .as("toks"))
      .withColumn("sz", size(col("toks")))
    val exploded = toks.select(col("doc_id"), col("sz"), explode(col("toks")).as("tok"))
    val dfCount = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefixFull = exploded.join(dfCount, "tok")
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ordered"))
      .select(col("doc_id"), col("sz"),
        sort_array(col("ordered.tok")).as("toks"),
        sort_array(slice(col("ordered.tok"), lit(1), prefLen)).as("pref"))
      .select(col("doc_id"), col("sz"), col("toks"), col("pref"),
        explode(col("pref")).as("ptok"))
    val prefixCk = t("1 prefix build+checkpoint") { prefixFull.localCheckpoint() }
    val sizeOk = least(col("a.sz"), col("b.sz")).cast("double") /
      greatest(col("a.sz"), col("b.sz")) >= threshold
    val firstShared = col("a.ptok") ===
      sortedFirstCommon(col("a.pref"), col("b.pref"))
    val jaccardExpr = sortedIntersectCount(col("a.toks"), col("b.toks")).cast("double") /
      (col("a.sz") + col("b.sz") - sortedIntersectCount(col("a.toks"), col("b.toks"))).cast("double")
    def joined = prefixCk.as("a").join(prefixCk.as("b"),
      col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id")
        && sizeOk && firstShared && jaccardExpr >= threshold)
    t("2 join+verify, ids only") { noop(joined.select(col("a.doc_id"), col("b.doc_id"))) }
    val projected = joined
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        sortedIntersectCount(col("a.toks"), col("b.toks")).as("inter"),
        (col("a.sz") + col("b.sz")).as("ssum"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("ssum") - col("inter")).cast("double")).as("jaccard"))
    t("3 + output jaccard") { noop(projected) }
    t("4 + orderBy (= operator)") { noop(projected.orderBy("doc_a", "doc_b")) }
    t("5 checkpoint + orderBy") {
      noop(projected.localCheckpoint().orderBy("doc_a", "doc_b"))
    }
    s.stop()
  }
}
