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
  // 8g default (env-overridable). r16 bumped this to 16g (+ parallel ref
  // processing below) off a single-boot A/B; the driver's 32-core bench
  // then regressed the two object-path NB-GLM queries 2.7x (d3 10.0 ->
  // 26.8 s, d4 4.07 -> 11.18 s) and the r17 same-boot 2x2 re-A/B at
  // driver config confirmed BOTH flags are net harmful here, separately
  // and together (full 191-query suite, local[32] sf0.1):
  //   16g+parRef raw 316.4 / warm 292.7 (d3 rerun unstable: 8.3 -> 13.8)
  //   8g +parRef raw 304.9 / warm 292.1
  //   8g  serial raw 283.1 / warm 261.3  <- r15 config, restored default
  // Mechanism consistent with observations: a bigger heap defers old-gen
  // collection so the MapGroups fit's object churn at 32-way concurrency
  // lands as giant mixed-GC pauses inside later timed windows.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the 139-query bench generates far more codegen classes than the
  // 240 MB default code cache holds; once it fills, the JIT stops
  // compiling and every later hot loop runs interpreted (measured: bf1
  // 8.4 s after a 14-query warmup vs 19.1 s after the full-suite warmup)
  "-XX:ReservedCodeCacheSize=1g",
) ++ (
  // -XX:+ParallelRefProcEnabled, DEFAULT OFF (opt in via
  // SPARK_GRAFT_PARREF=true). r16 enabled it bundled with the 16g heap
  // bump; the r17 separate-axis re-A/B at driver config (see the -Xmx
  // comment above for all three arms) measured it 22 s slower raw /
  // 31 s slower warm than the serial default even at 8g — on THIS
  // hardware the parallel ref-processing threads contend with 32 busy
  // mutator threads and lengthen every pause they ride. The env knob
  // keeps the axis a one-flag sweep for other hardware.
  if (sys.env.getOrElse("SPARK_GRAFT_PARREF", "false") == "true")
    Seq("-XX:+ParallelRefProcEnabled")
  else Seq.empty
)
