package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared-session base: one local SparkSession for the whole JVM test run
  * (Session.build getOrCreate's the same config across suites). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = Session.build(master = "local[4]", shufflePartitions = Some(4),
      appName = "graft-test",
      // keep saveAsTable artifacts (bucketed-join tests) out of the repo dir
      extraConf = Map("spark.sql.warehouse.dir" ->
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
