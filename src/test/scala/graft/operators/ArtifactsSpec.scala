package graft.operators

import graft.SparkSpec

class ArtifactsSpec extends SparkSpec {

  test("ensure: builds once, serves from the catalog, rebuilds after catalog loss") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-artspec").toString
    val name = s"graft_artspec_${Artifacts.key("artspec|1")}"
    var builds = 0
    def build(): Unit = {
      builds += 1
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
        .write.mode("overwrite").option("path", s"$root/$name").saveAsTable(name)
    }
    Artifacts.ensure(spark, Seq(name))(build())
    Artifacts.ensure(spark, Seq(name))(build())
    assert(builds == 1) // second call served from the catalog
    assert(spark.table(name).count() == 2)

    // The ADVICE r7 scenario: a session that lost the table (rebuilt
    // session, dropped catalog entry) must transparently rebuild instead
    // of serving a dangling name — existence is the CATALOG, not a memo.
    spark.sql(s"DROP TABLE $name")
    Artifacts.ensure(spark, Seq(name))(build())
    assert(builds == 2)
    assert(spark.table(name).count() == 2)
    spark.sql(s"DROP TABLE $name")
  }

  test("key: distinct build keys never share a table name") {
    // The abs(hashCode) names this replaced could collide across corpora;
    // the 96-bit digest makes a collision astronomically unlikely and —
    // more to the point — deterministic and content-derived.
    val keys = Seq("/a|5", "/b|5", "/a|3", "/a|5 ", "x|/a|5")
      .map(Artifacts.key)
    assert(keys.distinct.size == keys.size)
    assert(keys.forall(_.matches("[0-9a-f]{24}")))
    assert(Artifacts.key("/a|5") == Artifacts.key("/a|5")) // stable
  }
}
