package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-statistics manifest — the data-skipping layer of the table formats
  * (Iceberg manifest files, Delta add-file stats, Hive + parquet footers):
  * a small table of per-file (min, max, rows) on a clustering column, so a
  * selective range query opens only the files whose stat interval overlaps
  * the predicate instead of listing-and-scanning the whole store.
  *
  * Scale shape: the manifest is PLANNER metadata — |files| rows, not
  * |rows| — which is exactly what Iceberg/Delta keep driver-side when
  * planning a scan; collecting it is bounded by file count, never data
  * size. Skipping only pays when files are CLUSTERED on the stats column
  * ([[writeClustered]] range-partitions + sorts, so file intervals are
  * near-disjoint); on unclustered data every interval overlaps and the
  * manifest correctly prunes nothing. At 100 TB with millions of files the
  * manifest itself stays a table and the file cut becomes a join against
  * the scan's file-source relation instead of a collect — same contract
  * the IVF index documents for its probed-cell set.
  */
object StatsManifest {

  /** Write `df` clustered on `clusterCol`: range-partitioned into
    * `nFiles` near-disjoint sorted files (the layout that makes min/max
    * stats selective). */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** One aggregation pass over the store -> (file, min_v, max_v, n_rows)
    * per physical file, via the `_metadata.file_path` hidden column. */
  def build(spark: SparkSession, path: String, statsCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** [min_v, max_v] intersects [lo, hi), as a Column over manifest rows.
    * Null-safe in the conservative direction: all-null files have null
    * stats and are KEPT — a reader must not lose rows to missing stats,
    * the same conservatism Delta applies. */
  private def overlaps(lo: Column, hi: Column): Column =
    col("min_v").isNull || col("max_v").isNull ||
      (col("max_v") >= lo && col("min_v") < hi)

  /** Files whose stats interval intersects [lo, hi): the set a range scan
    * must open. */
  def candidateFiles(manifest: DataFrame, lo: Column, hi: Column): Seq[String] =
    manifest.filter(overlaps(lo, hi))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Range scan through the manifest: read ONLY the candidate files, then
    * apply the exact predicate (stats prune FILES, never the result — a
    * range with no overlapping files returns an EMPTY frame, exactly like
    * the plain scan would). One collect decides both the keep set and the
    * total, so the manifest aggregation runs once. Returns the dataframe
    * plus (filesRead, filesTotal) for the caller to assert skipping
    * actually happened. */
  def prunedScan(spark: SparkSession, manifest: DataFrame, statsCol: String,
                 lo: Column, hi: Column): (DataFrame, Int, Int) = {
    val rows = manifest
      .select(col("file"), overlaps(lo, hi).as("keep")).collect()
    require(rows.nonEmpty, "empty manifest: the store has no files")
    val files = rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq
    val pred = col(statsCol) >= lo && col(statsCol) < hi
    val df =
      if (files.nonEmpty) spark.read.parquet(files: _*).filter(pred)
      // schema-preserving empty result: a constant-false filter folds to
      // an empty LocalTableScan, no data I/O
      else spark.read.parquet(rows.map(_.getString(0)).toSeq: _*)
        .filter(lit(false))
    (df, files.size, rows.length)
  }
}
