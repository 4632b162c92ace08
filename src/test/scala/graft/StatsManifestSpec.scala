package graft

import org.apache.spark.sql.functions._

import graft.sources.{StatsManifest, Tables}

/** Manifest-based data skipping: the file cut is real, and never changes
  * results. */
class StatsManifestSpec extends SparkSpec {
  import spark.implicits._

  test("clustered store + manifest: per-file stats cover every row, and " +
      "an interior range opens strictly fewer files") {
    val store = java.nio.file.Files.createTempDirectory("graft-manifest")
      .toString
    val orders = Tables.orders(spark, sf0001)
    StatsManifest.writeClustered(orders, store, "o_orderdate", nFiles = 8)
    val manifest = StatsManifest.build(spark, store, "o_orderdate")
    assert(manifest.count() == 8)
    assert(manifest.agg(sum("n_rows")).collect().head.getLong(0)
      == orders.count())

    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1997-01-01"))
    val (scan, read, total) = StatsManifest.prunedScan(
      spark, manifest, "o_orderdate", lo, hi)
    assert(read < total, s"no files skipped: $read of $total")
    val expected = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val got = scan.select("o_orderkey").collect().map(_.getLong(0))
      .sorted.toSeq
    assert(got == expected)
  }

  test("a range with no overlapping files returns an EMPTY frame with the " +
      "store schema — stats prune files, never the result") {
    val store = java.nio.file.Files.createTempDirectory("graft-manifest-empty")
      .toString
    val orders = Tables.orders(spark, sf0001)
    StatsManifest.writeClustered(orders, store, "o_orderdate", nFiles = 4)
    val manifest = StatsManifest.build(spark, store, "o_orderdate")
    val (scan, read, total) = StatsManifest.prunedScan(
      spark, manifest, "o_orderdate",
      to_timestamp(lit("2100-01-01")), to_timestamp(lit("2101-01-01")))
    assert(read == 0 && total == 4)
    assert(scan.count() == 0)
    assert(scan.columns.toSeq == orders.columns.toSeq)
  }

  test("files with null stats are conservatively kept (no rows lost to " +
      "missing stats)") {
    val store = java.nio.file.Files.createTempDirectory("graft-manifest-null")
      .toString
    // one all-null-cluster file plus one real file
    Seq((1L, Option.empty[java.sql.Timestamp]),
        (2L, Option.empty[java.sql.Timestamp]))
      .toDF("id", "ts").coalesce(1).write.mode("overwrite").parquet(store)
    Seq((3L, Some(java.sql.Timestamp.valueOf("1996-06-01 00:00:00"))))
      .toDF("id", "ts").coalesce(1).write.mode("append").parquet(store)
    val manifest = StatsManifest.build(spark, store, "ts")
    val files = StatsManifest.candidateFiles(manifest,
      to_timestamp(lit("1990-01-01")), to_timestamp(lit("1991-01-01")))
    // the range matches NO real stats, but the null-stats file must stay
    assert(files.size == 1)
  }
}
