package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exchange-volume attribution for the custom TopKPerKey operator vs the
  * window-rank spelling (round 8): how many records cross the shuffle in
  * each plan, and the wall difference, at sf0.1. */
object ProfileTopK {
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

    @volatile var shuffleRecords = 0L
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        shuffleRecords += e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        shuffleRecords = 0L
        val t0 = System.nanoTime()
        f
        Thread.sleep(500) // listener events drain asynchronously
        println(f"$name%-16s run$i wall ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
          f"  shuffle-records $shuffleRecords%,d")
      }
    }

    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("totalprice"))
    println(s"orders rows: ${o.count()}")

    measure("window-rank") {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    measure("topk-per-key") {
      graft.plans.TopKPerKey(o, Seq(col("o_custkey")),
          Seq(col("totalprice").desc, col("o_orderkey").asc), 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
