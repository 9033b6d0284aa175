ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "instagram_data_pipelinespark"
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
// FailPoint (the kill-point test seam compiled into commit primitives)
// is inert unless this property is set; only the test JVM sets it.
Test / javaOptions += "-Dgraft.failpoints=true"
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
// The round driver parses the last stdout line of `sbt runMain graft.Bench`
// as the bench JSON; sbt's "[success] Total time …" epilogue printed after
// the JSON is what it found instead (BENCH_r01..r03 all show parsed:null).
// Suppress the epilogue so the JSON line is genuinely last.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// The forked runMain JVM's stdout/stderr normally pass through sbt's
// logger, which prefixes every line with "[info] "/"[error] " — the
// driver's JSON parse of the bench verdict line failed on that prefix
// for seven straight rounds (BENCH_r01..r07 all parsed:null; r07's tail
// shows the intact JSON behind "[info] "). StdoutOutput wires the
// forked process straight to this process's streams, no prefixes.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 123 distinct queries × whole-stage-codegen classes overflow the
  // default 240 MB code cache; UseCodeCacheFlushing then silently evicts
  // warm compiled methods, so late queries' warm runs re-JIT their hot
  // loops every iteration (measured: q_triangles warm 6.3s in a full
  // 123-query run vs 0.96s focused, same code). A long-lived session
  // serving a large query surface needs the cache sized for it.
  "-XX:ReservedCodeCacheSize=1g",
)
