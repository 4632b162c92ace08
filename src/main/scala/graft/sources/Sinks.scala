package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned-parquet sink for the fact table — the physical layout that
  * makes the flagship query's time filters prune at 100 TB: partitioning by
  * `ano` turns a year predicate into directory pruning (zero I/O for other
  * years), and parquet min/max stats prune months within a year.
  *
  * The reference's sink is row-at-a-time JDBC inserts with an ON CONFLICT
  * hash guard (/root/reference/etl/etl_ida.py:502-554); here idempotency is
  * the left-anti dedup in [[graft.plans.IdaMart.load]] and the write itself
  * is an atomic directory overwrite.
  */
object Sinks {

  /** Write a fact frame partitioned by year of `dateCol`. */
  def writeFactPartitioned(fact: DataFrame, path: String,
                           dateCol: String = "ano_mes"): Unit =
    fact.withColumn("ano", year(col(dateCol)))
      .repartition(col("ano")) // one shuffle -> one file set per partition dir
      .write.mode("overwrite")
      .partitionBy("ano")
      .parquet(path)

  /** Read back with partition pruning available on `ano`. */
  def readFact(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
