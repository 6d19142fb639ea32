ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gostreamsspark"
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
// One forked JVM PER SUITE, up to 6 concurrently: the 38-suite sequential
// run (~48 min of suite wall-clock at round 16) outgrew the driver's
// verify budget and the round closed on an unfinished `sbt test`
// (round-16 verdict item 1). Suites are independent by construction —
// per-suite table names under spark-warehouse/, per-run temp dirs, and a
// session conf that is now per-JVM (so one suite's conf fiddling, e.g.
// PlanShapeSpec's autoBroadcastJoinThreshold toggles, can no longer leak
// into a concurrently planning suite). 6 × local[4] task slots + driver
// threads fits the 32-core box; 6 × 8g heap fits 128 GiB.
Test / testGrouping := {
  val opts = ForkOptions()
    .withJavaHome((Test / javaHome).value)
    .withOutputStrategy((Test / outputStrategy).value)
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withWorkingDirectory((Test / baseDirectory).value)
    .withEnvVars((Test / envVars).value)
  (Test / definedTests).value.map { t =>
    Tests.Group(t.name, Seq(t), Tests.SubProcess(opts))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(8),
)
// The bench/verify contract is "the program's stdout": sbt's default
// LoggedOutput prefixes every forked line with "[info] ", which breaks
// any consumer that parses a stdout line as JSON. Pass it through raw.
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
