package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: exact per-column statistics — the engine-side
  * replacement for `DataFrame.summary` when results must be exact,
  * deterministic, and oracle-checkable.
  *
  * Scale shape: ONE AGGREGATION BRANCH PER COLUMN, unioned. Putting all
  * columns' exact `countDistinct`s into a single aggregation looks like
  * "one scan" but is a trap (measured here: 9.6 s vs 1.5 s at sf0.1):
  * Catalyst plans N distinct-aggs as an Expand that duplicates every
  * input row N+1 times before one giant shuffle. Per-column branches
  * instead each read ONLY their own column (parquet column pruning — the
  * union of branch scans reads the same bytes the fused scan would),
  * each branch's distinct is a two-phase partial aggregate with no
  * row-multiplication, and independent branches schedule in parallel
  * across the cluster. For a quick inexact profile swap `countDistinct`
  * for `approx_count_distinct` and fuse back to one pass (HLL sketches
  * don't need Expand).
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
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }
}
