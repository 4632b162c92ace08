package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 historization (Kimball SCD2): turn an
  * append-only change log into validity intervals — one row per (key,
  * attribute value run) with `[valid_from, valid_to)` half-open bounds and
  * an `is_current` flag. This is the missing half of a dimension upsert
  * sink: the reference's mart keeps only latest-state dims (ON CONFLICT DO
  * NOTHING); any warehouse user tracking attribute history needs the
  * interval form.
  *
  * Scale shape: both windows (change detection, interval close) share the
  * SAME partitioning and ordering, so Catalyst plans them over one
  * exchange — the whole operator is a single shuffle on the dimension key,
  * and per-key state is the key's own change history (dimension keys are
  * low-fan-out by definition). No global window exists.
  *
  * Determinism: `orderCols` must be a total order per key (pass a
  * tie-breaker id alongside the timestamp) — with ties, LAG/LEAD frames
  * are partition-layout dependent and re-runs would produce different
  * histories.
  */
object Scd2 {

  /** Collapse consecutive duplicate `attrCol` values per `keyCol` and emit
    * interval rows: `(key, attr, valid_from, valid_to, is_current)` where
    * `valid_from` is the first `orderCols.head` of the run, `valid_to` the
    * next run's start (NULL while current). NULL attribute values form
    * runs like any other value (null-safe comparison). */
  def fromChangeLog(log: DataFrame, keyCol: String, orderCols: Seq[String],
                    attrCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val ord: Seq[Column] = orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val changes = log
      .select((col(keyCol) +: ord) :+ col(attrCol): _*)
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col(attrCol) <=> col("__prev")))
    // the interval-close window keeps the FULL tie-broken order: two
    // changes sharing orderCols.head (e.g. same timestamp, different ids)
    // would otherwise make LEAD partition-layout dependent
    val wc = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    changes
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(wc))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol),
        col(orderCols.head).as("valid_from"), col("valid_to"), col("is_current"))
  }
}
