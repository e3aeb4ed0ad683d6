ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sciodbspark"
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
// Forked run output passes straight through to this process's stdout/stderr
// instead of sbt's logger: the logger prefixes every line with [info] /
// [error], which broke the driver's parse of Bench's one-line JSON contract
// in rounds 12 AND 13 (PERF_r13 prev/now_bench_ok:false — VERDICT r13
// item 1). StdoutOutput keeps the contract line byte-exact at column 0.
outputStrategy := Some(StdoutOutput)
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
  // JIT code cache sized for whole-stage-codegen workloads: the JDK default
  // (240 MB) fills up when one JVM runs hundreds of distinct query shapes,
  // and the sweeper then flushes hot methods into a compile/flush churn
  // (C2 thread measured at 187 s CPU / 807 s wall before this; full-sweep
  // bench 224 -> 178 s from this flag alone — OPTIMIZATION_r13.md,
  // Finding 0). Overridable the usual way via SPARK_GRAFT_EXTRA_JAVA_OPTS
  // (last flag wins on the JVM command line).
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "512m")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.split(" ").filter(_.nonEmpty))
