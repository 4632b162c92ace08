ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "idadataengineerprojectspark"
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
// The driver parses Bench's one-line JSON from stdout with json.loads;
// sbt's default LoggedOutput prefixes every forked-process line with
// "[info] ", which defeated the parse in rounds 1-4 (BENCH parsed:null).
// StdoutOutput passes the forked program's stdout through verbatim.
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
// Heap: the container provisions 128 GiB for the single-JVM local[32]
// session (driver + all executor threads share it). 8g forced the 159-query
// bench sweep into progressive GC pressure — late-sweep queries measured up
// to 9x their isolated cost (s7_fact_load 2.4 s isolated vs 20.9 s at
// sweep position ~130) purely from heap squeeze; 64g restores
// isolated-equal timings while leaving headroom for sbt + the DuckDB
// oracle process.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
)
