package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PyRepr

/** A/B: PyRepr as a Scala UDF (the round-1..4 formulation) vs the codegen
  * [[graft.functions.PyReprJson]] expression, same JVM, same data — the
  * measured delta recorded in BASELINE.md. Synthesizes rows with an array
  * and a map column (the two cases FlattenColumns rewrites) so the render
  * cost dominates over scan cost.
  */
object ProfilePyRepr {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val udfRepr = udf(PyRepr.jsonToPyRepr _)
    def viaUdf(c: Column): Column = udfRepr(to_json(c))

    val base = spark.range(n).select(
      array(col("id").cast("string"), lit("it's"), lit("b\nc")).as("arr"),
      map(lit("k"), col("id"), lit("j"), col("id") * 2).as("m"))
      .localCheckpoint() // freeze input: measure only the render

    def time(label: String, c: Column => Column): Double = {
      val t0 = System.nanoTime()
      base.select(c(col("arr")).as("a"), c(col("m")).as("b"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s $dt%.3f s")
      dt
    }
    // warm-up, then alternating measured runs
    time("warm-udf", viaUdf); time("warm-expr", PyRepr.pyRepr)
    val udfT = Seq.fill(3)(time("udf", viaUdf)).sorted.apply(1)
    val exprT = Seq.fill(3)(time("expr", PyRepr.pyRepr)).sorted.apply(1)
    println(f"median udf=$udfT%.3f s expr=$exprT%.3f s speedup=${udfT / exprT}%.2fx")
    spark.stop()
  }
}
