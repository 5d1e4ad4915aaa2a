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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the 139-query bench generates far more codegen classes than the
  // 240 MB default code cache holds; once it fills, the JIT stops
  // compiling and every later hot loop runs interpreted (measured: bf1
  // 8.4 s after a 14-query warmup vs 19.1 s after the full-suite warmup)
  "-XX:ReservedCodeCacheSize=1g",
)
