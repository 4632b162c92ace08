package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{BloomSkip, StatsManifest, Tables}

/** Per-file bloom data skipping: no false negatives ever, real pruning
  * on a layout where min/max stats are useless, row-level exactness. */
class BloomSkipSpec extends SparkSpec {

  test("bloom prunes files min/max cannot, and the pruned scan returns " +
    "exactly the looked-up rows") {
    val dir = Files.createTempDirectory("bloomskip").toString
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_id").isNotNull)
    StatsManifest.writeClustered(ev, dir, "user_id", nFiles = 8)

    // range stats on the scattered key: the user-clustered layout leaves
    // most files' [min,max] covering each probe (at this tiny scale a few
    // user/event correlations survive, so "most", not "all")
    val rangeManifest = StatsManifest.build(spark, dir, "event_id")
    val keys = Seq(7L, 123L, 876L)
    val rangeKept = keys
      .map(k => StatsManifest.candidateFiles(rangeManifest,
        lit(k), lit(k + 1)).toSet)
      .reduce(_ union _)

    val bloom = BloomSkip.build(spark, dir, "event_id")
    val (df, read, total) = BloomSkip.lookupScan(
      spark, dir, bloom, "event_id", keys)
    assert(total == 8)
    assert(read < total, s"bloom should prune ($read/$total)")
    assert(read < rangeKept.size,
      s"bloom ($read files) must beat min/max (${rangeKept.size} files) " +
        "on the scattered key")
    // no false negatives: every key's row comes back
    val got = df.select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == keys.toSet)
    // row-level exactness vs the plain scan
    val want = spark.read.parquet(dir)
      .filter(col("event_id").isin(keys: _*))
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(df.select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("a key absent from the table returns an empty frame (possibly " +
    "after false-positive file reads), never a wrong row") {
    val dir = Files.createTempDirectory("bloomskip-miss").toString
    val ev = Tables.events(spark, sf0001).filter(col("event_id").isNotNull)
    StatsManifest.writeClustered(ev, dir, "user_id", nFiles = 4)
    val bloom = BloomSkip.build(spark, dir, "event_id")
    val (df, read, total) = BloomSkip.lookupScan(
      spark, dir, bloom, "event_id", Seq(10_000_000L))
    assert(total == 4 && read <= total)
    assert(df.count() == 0)
  }

  test("every present key is admitted by its file's bloom (zero false " +
    "negatives across the whole table)") {
    val dir = Files.createTempDirectory("bloomskip-all").toString
    val ev = Tables.events(spark, sf0001).filter(col("event_id").isNotNull)
    StatsManifest.writeClustered(ev, dir, "user_id", nFiles = 8)
    val bloom = BloomSkip.build(spark, dir, "event_id")
    // probe a deterministic sample of 50 present keys in one scan
    val keys = (0L until 1000L by 20L).toSeq
    val (df, _, _) = BloomSkip.lookupScan(spark, dir, bloom, "event_id", keys)
    assert(df.select("event_id").collect().map(_.getLong(0)).toSet ==
      keys.toSet)
  }

  test("an INT-typed key column hashes identically to the BIGINT probe " +
    "side — no false skip from xxhash64's type dependence") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bloomskip-int").toString
    (0 until 256).map(i => (i, s"v$i")).toDF("k", "v") // k is IntegerType
      .repartition(4).write.mode("overwrite").parquet(dir)
    val bloom = BloomSkip.build(spark, dir, "k")
    val keys = Seq(3L, 77L, 200L)
    val (df, read, total) = BloomSkip.lookupScan(spark, dir, bloom, "k", keys)
    assert(total == 4 && read >= 1)
    assert(df.select("k").collect().map(_.getInt(0)).toSet ==
      keys.map(_.toInt).toSet, "present INT keys must never be skipped")
  }

  test("build rejects non-power-of-two or tiny bit sizes") {
    intercept[IllegalArgumentException] {
      BloomSkip.build(spark, "/nonexistent", "event_id", m = 1000)
    }
    intercept[IllegalArgumentException] {
      BloomSkip.build(spark, "/nonexistent", "event_id", m = 32)
    }
  }
}
