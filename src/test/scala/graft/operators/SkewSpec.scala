package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 10k rows all sharing one hot key + a long tail
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toLong)))
      .toDF("k", "payload")
    val dim = (1 to 200).map(i => (i.toLong, s"name$i")).toDF("k", "name")

    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", factor = 8, saltBy = Seq("payload"))

    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name").except(
      plain.select("k", "payload", "name")).isEmpty)
    assert(plain.select("k", "payload", "name").except(
      salted.select("k", "payload", "name")).isEmpty)
  }

  test("auto salt factor: celebrity key derives ceil(share*P), uniform skips salting (r16)") {
    import spark.implicits._
    // The seventh engine decision. Planted celebrity: one key holds 30%
    // of 10k rows -> factor = ceil(0.3 * 32) = 10 at the repo-standard
    // parallelism; the histogram statistics ride in the plan.
    val skewed = ((0 until 7000).map(i => (i % 1000 + 100L, i.toLong)) ++
      (0 until 3000).map(i => (7L, 10000L + i))).toDF("user_id", "event_id")
    val p = Skew.chooseSaltFactor(skewed, "user_id", col("event_id"),
      parallelism = 32)
    assert(p.factor === 10 && p.topCount === 3000L &&
      p.sampledRows === 10000L && p.sampleMod === 1L, p.toString)
    // uniform histogram -> factor 1 (the pre-r16 spelling exploded the
    // build side 8x here for nothing)
    val uni = (0 until 10000).map(i => (i % 1000L, i.toLong))
      .toDF("user_id", "event_id")
    val pu = Skew.chooseSaltFactor(uni, "user_id", col("event_id"),
      parallelism = 32)
    assert(pu.factor === 1, pu.toString)
    // output invariance in BOTH regimes: the auto join equals the plain
    // join (salting is output-invariant; factor 1 skips it entirely)
    val other = (0 until 1100).map(i => (i.toLong, s"seg${i % 5}"))
      .toDF("user_id", "seg")
    def agg(j: org.apache.spark.sql.DataFrame) = j.groupBy("seg").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (aj, ap) = Skew.saltedJoinAuto(skewed, other, "user_id",
      col("event_id"), Seq("event_id"), parallelism = 32)
    assert(ap.factor === 10 && agg(aj) == agg(skewed.join(other, "user_id")))
    val (uj, up) = Skew.saltedJoinAuto(uni, other, "user_id",
      col("event_id"), Seq("event_id"), parallelism = 32)
    assert(up.factor === 1 && agg(uj) == agg(uni.join(other, "user_id")))
    // registered-corpus decision points — the q23_skew_auto oracle
    // replays exactly these in SQL: sf0.001's events table is skewed
    // enough to salt (top share 8.8% -> 3), sf0.01's is not (0.86% -> 1)
    def evPlan(sf: String) = Skew.chooseSaltFactor(
      Tables.events(spark, s"/root/testdata/$sf")
        .select(col("user_id"), col("event_id")),
      "user_id", col("event_id"), parallelism = 32)
    assert(evPlan("sf0.001").factor === 3)
    assert(evPlan("sf0.01").factor === 1)
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toLong).toDF("id")
    val salts = df.select(Skew.salt(8, col("id")).as("s"))
    val r1 = salts.collect().map(_.getInt(0))
    val r2 = df.select(Skew.salt(8, col("id")).as("s")).collect().map(_.getInt(0))
    assert(r1.sameElements(r2))
    assert(r1.forall(s => s >= 0 && s < 8))
    assert(r1.distinct.length == 8) // actually spreads
  }
}
