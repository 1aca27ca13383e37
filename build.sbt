ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nyctaxibigdatapipelinespark"
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
// Route forked-run stdout straight through WITHOUT sbt's "[info] " logger
// prefix: the bench/verify drivers tail-capture our one-line JSON output,
// and a "[info] {" prefix breaks line-oriented JSON parsing (every
// BENCH_r*.json so far has parsed:null for exactly this reason).
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
scalacOptions += "-deprecation"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The whole ScalaTest run shares ONE forked JVM: every suite's
// SparkSession plus Catalyst explain-string buffers accumulate on a
// single heap, and at ~300 tests the 8g run-default OOMs flakily
// (observed: PlanSpec aborted mid-suite building a formatted explain
// while 266 earlier tests' garbage was still resident). Tests get a
// bigger ceiling; the host has 128 GiB.
Test / javaOptions := jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "16g")}",
)
// Scaling-slope gate as a one-word command (VERDICT r9 item 8): runs every
// headline query at sf0.01 and sf0.1 and exits non-zero if any time ratio
// exceeds the quadratic-detection gate (see graft.Slope scaladoc). A
// candidate-quadratic regression now fails `sbt slopeGate`, not a human.
addCommandAlias("slopeGate", "runMain graft.Slope")
