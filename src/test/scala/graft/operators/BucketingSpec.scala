package graft.operators

import java.nio.file.Files
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  test("bucketed fact-fact join plans without a shuffle before the join") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    Bucketing.writeBucketed(spark, "/root/testdata/sf0.001", wh, nBuckets = 4)
    // force the sort-merge path (tiny test tables would broadcast,
    // bypassing the bucketing we want to observe)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = Bucketing.bucketedJoin(spark)
    joined.collect() // let AQE finalize the plan
    // Only the final plan (AQE appends an "== Initial Plan ==" section).
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans, got:\n$plan")
    // the join inputs are pre-bucketed: no Exchange below the
    // SortMergeJoin (the join is the last operator chain, so everything
    // after its line is its subtree); the aggregate above it still has its
    // own exchanges, which is expected.
    val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    // and it still computes the right thing
    val rows = joined.collect()
    assert(rows.length == 5 && rows.forall(_.getDouble(1) > 0))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
