ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimegenaiembeddingsforragwithapacheflinkspark"
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
// Forked run output must reach stdout RAW: sbt's default LoggedOutput
// strategy prefixes every forked-process line with "[info] ", which is
// exactly how BENCH_r05 landed "parsed": null — the driver tails stdout
// of `sbt "runMain graft.Bench"` and json-parses the LAST line, and
// `[info] {…}` is not JSON. StdoutOutput passes the child's stdout
// through unmodified, so the Bench headline line IS the bytes Bench
// printed.
outputStrategy := Some(StdoutOutput)
// The round driver archives a 2000-byte stdout TAIL of `sbt "runMain
// graft.Bench"` and parses the LAST line as the headline JSON. sbt's
// "[success] Total time …" footer prints AFTER the forked JVM's last
// println, displacing the headline from the final line (BENCH_r04
// landed "parsed": null exactly this way). Suppressing the footer makes
// the Bench headline the true last stdout line; exit codes still carry
// success/failure for every sbt invocation.
ThisBuild / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
