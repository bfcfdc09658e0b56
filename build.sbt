ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "analyzingbigdatainscalaspark"
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
// The bench/verify contract needs the final JSON line to reach the
// caller raw and LAST: StdoutOutput stops sbt prefixing forked-process
// stdout with "[info] ", and showSuccess=false drops the trailing
// "[success] Total time: ..." epilogue that otherwise becomes the last
// line of output (both broke the caller's tail-parse in r1-r6).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // 16g default (host has 125 GiB): a 200-query Verify/Bench session
  // retains per-family memo blocks (localCheckpoint) for its whole
  // lifetime, and at 8g the tail of a full pass ran under GC pressure —
  // single-query in-run readings degraded up to 5× vs isolation
  // (q46_unpivot 39 s in-run / 1.5 s isolated, round 8).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
