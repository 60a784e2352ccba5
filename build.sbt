ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lingodbspark"
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
// Pass the forked JVM's stdout through verbatim instead of logging each
// line with an "[info] " prefix: Bench's contract is ONE machine-parseable
// JSON line on stdout, and the logger prefix broke the driver's extraction
// of it every round (BENCH_r*.json "parsed": null).
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
  // FIXED heap (-Xms = -Xmx) + pre-touch, same policy as tools/run_main.sh:
  // this host's memory is lazily backed, so a GROWING heap pays multi-second
  // first-touch page stalls inside whatever runs while it expands —
  // StageProbe measured 484 ms of GC inside a 194 ms sf0.1 scan stage under
  // the old growing 8g default. Pre-touching pays that cost once at JVM
  // startup, outside any measured query.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseG1GC",
  // System.gc() (ContextCleaner periodic GC) as a concurrent cycle, not a
  // multi-second STW Full GC — see tools/run_main.sh
  "-XX:+ExplicitGCInvokesConcurrent",
)
// The test JVM smoke-runs every contract query (OperatorsSpec) at sf0.001;
// isolate its source-sink scratch dir so a concurrent Verify at another SF
// can't be clobbered between its write and the DuckDB re-read.
Test / javaOptions += "-Dgraft.sources.root=/tmp/graft_sources_test"
