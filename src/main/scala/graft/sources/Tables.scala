package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-fixed readers over the driver fixture tables (TESTDATA.md).
  *
  * Replaces the reference's network sources (REST catalog scan + in-memory
  * ODS fetch, /root/reference/etl/etl_ida.py:653-730) with columnar parquet
  * scans: at 100 TB the scan must support predicate pushdown, column pruning
  * and partition pruning, which parquet + Catalyst give for free and
  * row-wise spreadsheet ingestion cannot.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Generic reader; `events` gets its nanosecond timestamp normalized. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeEventTs(raw) else raw
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The fixture's `events.ts` encoding has changed across driver
    * generations; the reader absorbs all three observed parquet encodings and
    * always surfaces a (UTC-instant) TimestampType:
    *
    *  - INT64 TIMESTAMP(NANOS): with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` Spark surfaces it as a
    *    LongType of nanoseconds. Convert with integer division (`div`) — a
    *    double round-trip would lose precision for epoch-nanos
    *    (~1.7e18 > 2^53) and could flip a microsecond vs DuckDB's own
    *    nanos->micros truncation.
    *  - TIMESTAMP(MICROS) isAdjustedToUTC=false: Spark reads TIMESTAMP_NTZ.
    *    The session timezone is pinned UTC ([[graft.Session.confFor]]), so
    *    casting to TimestampType reinterprets the wall-clock values as UTC
    *    instants value-exactly — the same thing DuckDB does when it reads
    *    the column as a naive timestamp.
    *  - TIMESTAMP(MICROS) isAdjustedToUTC=true: already TimestampType.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
}
