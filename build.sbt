ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tcgaqueryprojectspark"
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
// The driver's bench parse reads a bounded stdout TAIL and needs Bench's
// summary JSON line BARE and LAST. With the default LoggedOutput the
// forked run's stdout is re-logged as "[info] {...}" and followed by a
// "[success] Total time" line — both r6 and r7 ended "parsed": null for
// exactly this reason (BENCH_r07.json's tail shows the wrapped line).
// StdoutOutput lets the forked JVM write the fd directly (no prefix);
// showSuccess drops the trailing [success] line so the summary is the
// final stdout line of the sbt invocation.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint so the warning doesn't pollute driver logs
Global / excludeLintKeys += showSuccess
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default (was 8g, env-overridable): local[32] runs 32 concurrent
  // tasks' execution memory + broadcast + cache in ONE JVM; at 8g the
  // 191-query suite accumulates old-gen debt that lands in later
  // queries' timed windows (the in-suite premium over isolated runs).
  // The sandbox has 128 GiB; r16 full-suite A/B (16g + parallel ref
  // processing vs 8g serial): raw total 279.7 -> 265.7 s, warm 261.6 ->
  // 259.4 — the raw delta is GC-stall reduction (warm_total nets stalls
  // by construction, so it moves less).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // the 139-query bench generates far more codegen classes than the
  // 240 MB default code cache holds; once it fills, the JIT stops
  // compiling and every later hot loop runs interpreted (measured: bf1
  // 8.4 s after a 14-query warmup vs 19.1 s after the full-suite warmup)
  "-XX:ReservedCodeCacheSize=1g",
  // JDK 17 G1 processes j.l.ref.Reference instances single-threaded by
  // default (parallel became the default only in JDK 18, JDK-8286706);
  // a 191-query Spark suite churns tens of thousands of weak refs
  // (broadcast/shuffle/accumulator cleanup through ContextCleaner), so
  // reference processing rides every GC pause. Parallelizing it is a
  // pure throughput win on a 32-core box (r16 full-suite A/B recorded
  // in OPTIMIZATION_r16.md).
  "-XX:+ParallelRefProcEnabled",
)
