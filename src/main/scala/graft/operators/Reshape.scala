package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural reshape operators — the heart of the reference pipeline
  * (SURVEY.md §2.9).
  *
  * R1 unpivot replaces the reference's nested Python loop over rows x
  * month-columns (/root/reference/etl/etl_ida.py:315-378): Spark's native
  * `unpivot` is a narrow, shuffle-free transformation — each input row
  * expands to k output rows inside the same partition, so it scales linearly
  * to any data size with zero data movement.
  *
  * R2 pivot uses an explicit value list (schema_star.sql:148-163 hardcodes
  * the 10 group columns): a single hash-aggregate shuffle on the grouping
  * keys, no second pass to discover pivot values.
  */
object Reshape {

  /** R1: wide -> long. `ids` kept as-is, each column in `values` becomes a
    * (variableCol, valueCol) row. */
  def unpivot(df: DataFrame, ids: Seq[String], values: Seq[String],
              variableCol: String = "variavel",
              valueCol: String = "valor"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, variableCol, valueCol)

  /** R2: long -> wide with a fixed, deterministic column list.
    * `agg` defaults to max (MAX(CASE WHEN ...) in schema_star.sql:151-160). */
  def pivot(df: DataFrame, groupCols: Seq[String], pivotCol: String,
            pivotValues: Seq[String], valueCol: String,
            agg: Column => Column = max): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(agg(col(valueCol)))

  /** Context-window chunking: split each document into fixed-size token
    * windows advancing by `stride` (overlap = window - stride) — the
    * sequence-prep step before packing samples for training. One narrow
    * generate (posexplode) per doc, no shuffle; blank/null docs yield no
    * chunks. The final window is allowed to run short rather than being
    * dropped (tail tokens are data too). Chunk count =
    * 1 + ceil(max(n_tokens - window, 0) / stride), deterministic and
    * restatable in the DuckDB oracle. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    val extra = greatest(size(toks) - window, lit(0))
    val nChunks = ((extra + (stride - 1)) / stride).cast("int") + 1
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .withColumn("__toks", toks)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(col("__toks"), i * stride + 1, lit(window)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), "\\s+")))
  }

  /** W3: forward-fill — pandas `ffill()` on merged-cell group names
    * (/root/reference/etl/etl_ida.py:249). Requires an explicit row-order
    * column: Spark has no implicit row order (SURVEY §7.3).
    *
    * Scale note: a single unpartitioned window would serialize on one task.
    * Callers fill *within* a natural partition (e.g. source file) whenever one
    * exists; `partitionCols` empty falls back to a global window, acceptable
    * only for driver-sized frames (raw spreadsheet parses).
    */
  def forwardFill(df: DataFrame, orderCol: String, fillCols: Seq[String],
                  partitionCols: Seq[String] = Nil): DataFrame = {
    // the appended constant anchor (Fns.singlePartitionKey) never changes
    // the grouping, but keeps the partition spec non-empty even when every
    // real partition column constant-folds (e.g. a lit() file-name column
    // on a single-file frame) — so WindowExec's "No Partition Defined"
    // warning stays reserved for ACCIDENTAL global windows. With no
    // partitionCols the anchor alone gives the documented global-fill
    // fallback, single-partition by explicit choice.
    val base = Window.partitionBy(partitionCols.map(col) :+
      graft.functions.Fns.singlePartitionKey(col(orderCol)): _*)
    val w = base.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
