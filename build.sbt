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
// Heap: 8g measured as good as 16g/64g on a 30-query A/B (bigger heaps
// actually lost: System.gc between bench queries walks the whole heap).
// Code cache: the default 240 MB JIT code cache is the real long-sweep
// hazard — 160+ queries of large whole-stage-codegen classes fill it,
// UseCodeCacheFlushing then churns hot methods in and out and mid-sweep
// queries measure 3-10x their isolated cost (dedup_cluster 2.5 s isolated
// vs 18 s mid-sweep, q1_agg 0.6 s vs 5.2 s — pattern varies run to run,
// exactly what sporadic deopt/flush cycles produce). 2g keeps every
// compiled stage resident for the whole sweep.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:ReservedCodeCacheSize=2g",
)
