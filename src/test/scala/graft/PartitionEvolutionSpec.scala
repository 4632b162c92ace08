package graft

import org.apache.spark.sql.functions._

/** Partition-spec evolution: one read path over a month-partitioned
  * legacy store and a day-partitioned current store, with the predicate
  * translated per layout. The old data keeps its coarser pruning
  * granularity; nothing gets rewritten. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("per-layout predicate translation prunes each store at its own " +
    "granularity") {
    val root = java.nio.file.Files.createTempDirectory("pevo").toString
    // legacy: Jan+Feb 2024 by month; current: March 2024 by day
    val legacyRows = (1 to 59).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1)
      (i.toLong, java.sql.Date.valueOf(d), f"${d.getYear}%04d-${d.getMonthValue}%02d")
    }
    legacyRows.toDF("id", "day", "month").drop("day")
      .write.partitionBy("month").parquet(s"$root/legacy")
    val currentRows = (1 to 31).map { i =>
      (100L + i, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, i)))
    }
    currentRows.toDF("id", "day")
      .write.partitionBy("day").parquet(s"$root/current")

    // query range: Feb 20 .. Mar 5
    val legacy = spark.read.parquet(s"$root/legacy")
      .filter(col("month").isin("2024-02"))
    val current = spark.read.parquet(s"$root/current")
      .filter(col("day").between(lit("2024-03-01"), lit("2024-03-05")))

    // inputFiles ignores pushed partition filters — the pruned set lives
    // on the scan node's selectedPartitions
    def prunedDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toPath.getParent.getName).toSet
      }.head

    val legacyDirs = prunedDirs(legacy)
    assert(legacyDirs == Set("month=2024-02"),
      s"legacy must prune to the one overlapping month: $legacyDirs")
    val currentDirs = prunedDirs(current)
    assert(currentDirs == (1 to 5).map(i => f"day=2024-03-$i%02d").toSet,
      s"current must prune to exactly the in-range days: $currentDirs")
    // coarser legacy pruning returns the whole month (28 staged February
    // days) — the residual row filter is what narrows it to Feb 20..28,
    // which is exactly why evolved reads keep a per-layout residual
    assert(legacy.count() == 28 && current.count() == 5)
  }
}
