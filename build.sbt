ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stocketlpipelinespark"
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
// Forked `run` output goes through sbt's logger by default, which
// prefixes every line with "[info] " — that breaks any consumer that
// json-parses the Bench/Verify metric lines from stdout (the driver's
// BENCH parse failed on exactly this every round). StdoutOutput passes
// the child's stdout/stderr through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// sbt's "[success] Total time: ..." epilogue prints AFTER the Bench
// metric line, so the driver's parse-the-last-stdout-line step read
// the epilogue instead of the metrics every round. Suppress it; exit
// codes are unaffected.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint cannot see.
Global / excludeLintKeys += showSuccess
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
  "-Dspark.sql.ansi.enabled=false",
  // 8g forced full-GC churn across the 81-query bench (one JVM, 3 reps
  // each): tiny-output aggregates showed 3-10x timing jitter. The box
  // has 128 GiB; 20g removes the pressure without risking the host.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // ~100 queries x 3 repeats of whole-stage codegen in ONE JVM blow
  // through the default 240 MB JIT code cache; once it fills, the JIT
  // stops compiling and late queries run partially interpreted (the
  // round-8 diagnosis of 2-4x inflation that moved between queries
  // across rounds: q45/q46 in r7, q82/q67 in r8). Room to never flush,
  // plus a larger Spark generated-class cache so repeats of the same
  // plan reuse their classes instead of recompiling.
  "-XX:ReservedCodeCacheSize=2g",
  "-Dspark.sql.codegen.cache.maxEntries=2000",
)
