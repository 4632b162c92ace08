package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed-snapshot reconciliation — the data-diff audit between two
  * versions of a keyed store (yesterday's dimension vs today's, primary
  * vs replica, pre- vs post-migration): which keys appeared, which
  * vanished, which rows changed. The operational complement of the CDC
  * path ([[graft.streaming.CdcUpsert]] produces stores; this explains how
  * two of them differ) and of the referential audit (`audit_orphans`).
  *
  * Shape: ONE full-outer shuffle join on the key; the compared columns
  * ride as a single struct per side so row equality is one comparison
  * whatever the column count, and equal rows are dropped before anything
  * else happens — output is bounded by the CHANGE set, never the store.
  * At 100 TB both snapshots would be bucketed on the key (`j_bucketed`
  * discipline) making the diff join co-located and shuffle-free.
  *
  * Struct equality is Spark's ordered null-safe field comparison (`<=>`
  * per field); NULL-valued cells compare equal to NULL, so a row flips to
  * `changed` only on a real value change. */
object StoreDiff {

  /** Diff `left` vs `right` on `keys`, comparing `valueCols`. Returns one
    * row per differing key: `(keys..., status, l_<col>..., r_<col>...)`
    * with status ∈ {only_left, only_right, changed}. */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String],
           valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty,
      "StoreDiff.diff: keys and valueCols must be non-empty")
    def side(df: DataFrame, tag: String) =
      df.select(keys.map(col) :+
        struct(valueCols.map(col): _*).as(s"__$tag"): _*)
    side(left, "l").join(side(right, "r"), keys, "full_outer")
      .withColumn("status",
        when(col("__l").isNull, lit("only_right"))
          .when(col("__r").isNull, lit("only_left"))
          .when(!(col("__l") <=> col("__r")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) ++ Seq(col("status")) ++
        valueCols.map(c => col(s"__l.$c").as(s"l_$c")) ++
        valueCols.map(c => col(s"__r.$c").as(s"r_$c")): _*)
  }
}
