ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "amazonsalesdataengineeringspark"
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
// Forked run output goes straight to stdout (no sbt "[info] " log
// decoration) so Bench's single JSON line stays machine-parseable.
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

// ---------------------------------------------------------------------
// Parallel test groups. The sequential forked run measured 17:14 on an
// un-drifted box (sum of suite walls 1021 s; per-suite -oD timing,
// round 22) and the round-21 driver gate killed it at its ~30-minute
// budget on a drifted one. Suites are independent by construction —
// per-JVM warehouse (TestSession), per-pid scratch db (JvmScratch),
// per-pid fixture cache (DedupQueries.dropCacheBase), read-only test
// data — so four forked JVMs balanced by the measured suite walls
// (~255 s each) run them in parallel: ~3x less wall, same tests.
// Unlisted/new suites land in the light group 3. Each group is a
// local[4] session, so 4 groups use 16 of the 32 cores and 4x8g heap.
val heavySuiteGroup: String => Int = {
  case s if s.endsWith("SplitCsvSpec") || s.endsWith("SplitJsonSpec") => 0 // 144+107
  case s if s.endsWith("StreamReplaySpec") || s.endsWith("RetractionSpec")
         || s.endsWith("GraphSpec") => 1                                   // 143+80+35
  case s if s.endsWith("PlanAuditSpec") || s.endsWith("DurableArtifactsSpec")
         || s.endsWith("TechniqueSpec") || s.endsWith("MaintenanceSpec") => 2 // 82+69+64+33
  case _ => 3                                                              // ~260 of small suites
}
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value
    .groupBy(t => heavySuiteGroup(t.name)).toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"group$g", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// sbt's default restrictions cap ForkedTestGroup at 1; lift it to the
// group count (and keep a generous overall task cap).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(15),
)
