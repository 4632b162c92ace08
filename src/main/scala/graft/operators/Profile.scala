package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics in ONE scan — the engine-side
  * replacement for `DataFrame.summary` when results must be exact,
  * deterministic, and oracle-checkable.
  *
  * Scale shape: all columns' aggregates run in a single global
  * aggregation pass. The exact distinct counts make Catalyst plan an
  * Expand (input duplicated once per distinct-agg column) — the standard
  * exact-profile tradeoff, still one scan of the table; for a quick 100 TB
  * profile swap `countDistinct` for `approx_count_distinct` (HLL, no
  * Expand) at the cost of oracle exactness. The final per-column reshape
  * explodes a single driver-sized row — no data-path cost.
  *
  * min/max are surfaced as strings for a uniform output schema; pass
  * pre-formatted columns (e.g. `date_format`ed dates) when the default
  * cast's engine-specific formatting matters (floating-point columns
  * format differently across engines — format them explicitly). */
object Profile {

  /** `(column, n_rows, n_nulls, n_distinct, min_val, max_val)` per
    * requested column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"__c_$c"),
          countDistinct(col(c)).as(s"__d_$c"),
          min(col(c)).cast("string").as(s"__mn_$c"),
          max(col(c)).cast("string").as(s"__mx_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__c_$c")).as("n_nulls"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"), col(s"__mx_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
