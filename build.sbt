ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mktd6flinkspark"
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
// The bench contract (VERDICT r14 #2): graft.Bench prints ONE JSON line
// and the driver parses it from the stdout TAIL — sbt's "[success]
// Total time …" epilogue after the forked run was the only line behind
// it and left PERF_r14.json empty ("parsed": null). Success/failure is
// carried by the exit code (the driver records rc); the epilogue is
// cosmetic, so drop it and the JSON is the last stdout line.
Global / showSuccess := false
// …and un-prefix it: sbt's default fork output strategy routes the
// child's stdout through the logger, which stamps "[info] " onto every
// line — a strict json-loads of the tail line fails on the prefix.
// StdoutOutput pipes the forked run's stdout straight through.
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
  // local[N] is one JVM: the driver heap IS the executor heap. 32 task
  // threads shuffling millions of rows thrash an 8g heap (measured GC
  // spikes up to 438 s); the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // One long-lived JVM runs 43 queries' worth of Janino-generated
  // classes (and Bench/Explain re-run them): the default 240 MB code
  // cache fills, the JIT silently stops compiling, and identical
  // reruns inflate 5-10x CPU (measured: the same tokenize stage 32 s
  // -> 134 s task time on run 2). Size the cache for codegen churn.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
