ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "machinelearningalgomapreducespark"
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
// Pass the forked process's stdout straight through instead of routing it
// via sbt's logger — the logger prefixes every line with "[info] ", which
// breaks machine parsing of Bench's JSON line.
run / outputStrategy := Some(StdoutOutput)
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
)
// Round 10: fork one JVM per test SUITE and run up to 10 suites at once.
// A single test JVM uses local[4] (4 of the 32 cores) and the full suite
// in it ran ~47 min — past the driver's test budget (VERIFY_r09
// tests_ok=false). Per-suite JVMs + the QueriesSmokeSpec shard split
// restore the lost parallelism without dropping a single test (measured:
// 47 min → 15.5 min at 7 lanes, → see OPTIMIZATION_r10.md at 10). Test
// JVMs get a 4g heap (sf0.001 corpora; the suite previously shared one
// 8g JVM): 10 × 4g + 10 × local[4] fits the 128 GiB / 32-core sandbox.
Test / testGrouping := {
  val opts = ((Test / javaOptions).value.filterNot(_.startsWith("-Xmx"))
    :+ "-Xmx4g").toVector
  (Test / definedTests).value.map { td =>
    Tests.Group(td.name, Seq(td),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 10),
  Tags.limitAll(16),
)
