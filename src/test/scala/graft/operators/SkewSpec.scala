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
