ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hdfswithpysparkspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger: the
// driver parses graft.Bench's one-line JSON from the process tail, and the
// logger's "[info] " prefix made every round's line unparseable
// (BENCH_r03/r04 "parsed": null).
run / outputStrategy := Some(StdoutOutput)
// no "[success] Total time: ..." trailer: graft.Bench's JSON line must be
// the LAST thing on stdout, inside the driver's tail-sized capture window
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the bench runs 32 executor threads in one JVM; at 8g the
  // block manager (~4.6g storage) filled with unreaped broadcasts and the
  // late-alphabet heavy queries paid the GC churn (BENCH_r04 q49).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // a full-catalog bench generates thousands of codegen classes in one
  // JVM; the default ~240m code cache fills mid-catalog, the JIT stops
  // compiling, and late-alphabet heavy queries run ~2x interpreted
  "-XX:ReservedCodeCacheSize=512m",
)
