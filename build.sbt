ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hybrid_vector_searchspark"
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
// The driver parses Bench/Verify stdout for the ONE JSON result line.
// sbt's default LoggedOutput prefixes forked-run stdout with "[info] "
// and appends a "[success] Total time" line — both break a last-line
// JSON parse (BENCH_r03/r04 recorded `parsed: null`). Stream the forked
// process's stdout raw and drop the success banner so the JSON line is
// the literal last line of stdout.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 285 queries' whole-stage-codegen classes churn the JIT code cache —
  // the documented late-bench degradation (Bench.HeavyFirst doc: heavy
  // queries re-ordered first because alphabetical tail entries tripled
  // under accumulated code-cache pressure). The default 240 MB cache
  // forces deoptimization/flushing storms late in a 285-query run;
  // 512 MB holds the full suite's compiled code.
  "-XX:ReservedCodeCacheSize=512m",
)
