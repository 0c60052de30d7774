ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "azuresalesetlpipelinespark"
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
// Forked-run stdout must reach the caller UNPREFIXED: the default logger
// wraps every line in "[info] ", which breaks the bench driver's JSON
// parse (rounds 1-2: parsed=null despite valid per-query lines in the
// tail). Project-level so run/runMain/test all delegate to it.
outputStrategy := Some(StdoutOutput)
// ...and sbt's own "[success] Total time" epilogue must not trail the bench
// JSON: with it suppressed, Bench's final re-emit is the LAST stdout line of
// the whole `sbt "runMain graft.Bench"` invocation (rounds 1-3: the driver's
// parse came up null despite valid JSON lines in the tail).
Global / showSuccess := false
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
// 32g default: the bench suite runs ~195 queries in ONE JVM whose
// cross-query caches (star fact, staged SCD2) plus per-query scoped
// persists overflowed an 8g heap — storage eviction inflated isolated
// 1-11s queries to 9-48s (round-4 measurement). The sandbox has 128 GiB;
// a local[32] driver-executor gets a quarter of it.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
