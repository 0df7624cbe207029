package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A shuffle join hash-partitions both sides on the join key, so one hot
  * key (a null-ish default, a celebrity user, a catch-all category) lands
  * an entire cluster's worth of rows on one task. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) handles sort-merge cases at runtime;
  * salting is the plan-level alternative that also works for aggregations
  * feeding a join and for deterministic testing:
  *
  *  - the SKEWED side gets a deterministic salt in [0, factor) derived
  *    from row content (never `rand()` — results must be reproducible
  *    across retries, or a task re-run silently changes the answer);
  *  - the OTHER side is exploded `factor`× so every (key, salt) pair
  *    still meets exactly once;
  *  - the join key becomes (key, salt), spreading the hot key over
  *    `factor` tasks.
  */
object Skew {

  /** Deterministic row salt in [0, factor). */
  def salt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor.toLong)).cast("int")

  /** Inner-join `skewed` with `other` on `skewed(key) === other(key)`,
    * spreading each key of the skewed side over `factor` tasks. `saltBy`
    * are skewed-side columns that disambiguate rows sharing a key (any
    * stable id column works). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int, saltBy: Seq[String]): DataFrame = {
    val salted = skewed.withColumn("__salt",
      salt(factor, saltBy.map(skewed(_)): _*))
    val exploded = other
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
