ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cartodbimporterspark"
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
// No "[success] Total time" banner: the bench driver parses the LAST
// stdout line of `sbt runMain graft.Bench` as the one-line JSON metric,
// and the banner printed after program exit displaced it (BENCH_r13's
// driver capture shows parsed: null with the JSON one line up). Errors
// still report; exit codes are unaffected.
Global / showSuccess := false
// Pass the forked JVM's stdout through RAW. sbt's default output strategy
// decorates every forked-run line with a "[info] " logger prefix, so the
// bench driver's JSON parse of the last stdout line saw "[info] {...}" —
// not valid JSON (BENCH_r15's tail shows exactly this). StdoutOutput
// inherits the parent process stdout with no logger in between.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
)
