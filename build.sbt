ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "thundercatsspark"
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
// The suite list runs SEQUENTIALLY inside one forked JVM by default —
// 28 min of wall time on a 32-core host with every suite on a local[4]
// session (r14's driver verify timed out exactly here). Split the
// suites across forked JVMs instead: each group is its own JVM with its
// own local[4] session (same per-suite semantics, same session config,
// suites within a group still sequential), and the groups run
// concurrently — 8 groups × local[4] = the host's 32 cores. The three
// heaviest suites (GraphSpec ~9 min, PlanFingerprintSpec ~3 min,
// DedupSimilaritySpec ~2 min — measured from the r15 baseline log) get
// dedicated groups so no group is ever two heavyweights deep.
val testGroupCount = 8
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val pinned = Map(
    "graft.operators.GraphSpec" -> 0,
    "graft.PlanFingerprintSpec" -> 1,
    "graft.operators.DedupSimilaritySpec" -> 2,
    "graft.streaming.StreamSpec" -> 3,
    "graft.operators.StatsSpec" -> 4,
    "graft.ReferenceGoldenSpec" -> 5,
    "graft.operators.TimeSeriesSpec" -> 6,
    "graft.model.MLSpec" -> 7)
  val grouped = tests.groupBy(t =>
    pinned.getOrElse(t.name,
      math.abs(t.name.hashCode) % testGroupCount))
  grouped.toSeq.sortBy(_._1).map { case (i, ts) =>
    Tests.Group(s"g$i", ts, Tests.SubProcess(forkOpts))
  }
}
// let all groups actually run in parallel: sbt's DEFAULT restrictions
// include `Tags.limit(Tags.ForkedTestGroup, 1)`, and appending another
// limit cannot raise it (the most restrictive rule wins) — the set must
// be REPLACED to lift the group cap
Global / concurrentRestrictions := Seq(
  Tags.limitAll(testGroupCount + 2),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// Pass the forked JVM's stdout through raw (no sbt "[info] " prefix) so
// the single JSON line printed by graft.Bench / graft.Verify is
// machine-parseable by the benchmark harness.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
