ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "funddataetlpipelinespark"
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
// Forked `run` output normally routes through sbt's logger, which
// prefixes every line with "[info] " — so Bench's contract line never
// starts with '{' and the driver's JSON parse of the stdout tail has
// come back null every round (BENCH_r01..r12 all have parsed:null).
// StdoutOutput passes the forked process's stdout through verbatim.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 205-query sweep generates far more whole-stage-codegen classes
  // than the JVM's default 240 MB code cache holds; once it fills,
  // the JIT flushes hot methods and re-interprets them — ops that
  // measure ~0.15 s in a small session read 10x that mid-sweep
  // (round 17). 512 MB keeps the sweep's compiled code resident.
  "-XX:ReservedCodeCacheSize=512m",
)
