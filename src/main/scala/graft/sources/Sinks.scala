package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned-parquet sink for the fact table — the physical layout that
  * makes the flagship query's time filters prune at 100 TB: partitioning by
  * `ano` turns a year predicate into directory pruning (zero I/O for other
  * years), and parquet min/max stats prune months within a year.
  *
  * The reference's sink is row-at-a-time JDBC inserts with an ON CONFLICT
  * hash guard (/root/reference/etl/etl_ida.py:502-554); its physical tuning
  * is covering indexes (schema_star.sql:96-101). Here idempotency is the
  * left-anti dedup in [[graft.plans.IdaMart.load]] and the tuning analog is
  * directory partitioning + parquet stats.
  */
object Sinks {

  /** Write a fact frame partitioned by year.
    *
    * If the frame already carries an `ano` column it is used verbatim;
    * otherwise it is derived as `year(dateCol)`.
    *
    * Layout shape at scale: a plain `partitionBy("ano")` write emits one
    * file per (task x year) — at 100 TB with thousands of tasks that is a
    * small-files explosion; a bare `repartition($"ano")` collapses each year
    * onto ONE task — a parallelism cliff. The middle path shuffles on
    * (ano, salt) so each year directory is written by up to `filesPerYear`
    * parallel tasks and contains at most that many files. The salt is
    * derived from the input partition id, so it costs no data-dependent
    * hashing and spreads rows evenly regardless of key skew.
    */
  def writeFactPartitioned(fact: DataFrame, path: String,
                           dateCol: String = "ano_mes",
                           mode: String = "overwrite",
                           filesPerYear: Int = 8): Unit = {
    val withAno =
      if (fact.columns.contains("ano")) fact
      else fact.withColumn("ano", year(col(dateCol)))
    withAno
      .repartition(col("ano"),
        pmod(spark_partition_id(), lit(filesPerYear)).as("__salt"))
      .write.mode(mode)
      .partitionBy("ano")
      .parquet(path)
  }

  /** Read back with partition pruning available on `ano`. */
  def readFact(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
