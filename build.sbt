ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "targets3parquetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Emit the forked program's stdout/stderr RAW (no sbt [info]/[error]
// prefixes) so the driver can parse Bench's one-line JSON from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// forward stdin to the forked JVM so `tap | sbt "runMain graft.Main"`
// (the reference's pipe-mode UX) actually receives the messages
run / connectInput := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 138-query suite generates thousands of whole-stage-codegen
  // classes; the JDK default JIT code cache is 240 MB. An A/B of full
  // closes with and without this flag (BASELINE.md round 9) showed NO
  // local difference — the builder box never reproduces the driver
  // artifacts' heavy-tail inflation either way, so that inflation is
  // driver-environment, not code cache. Kept as cheap insurance for
  // longer-lived JVMs: reserved address space, not committed memory.
  "-XX:ReservedCodeCacheSize=1g",
)
