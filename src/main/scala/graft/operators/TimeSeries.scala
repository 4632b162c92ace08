package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key daily series
  * onto the dense date spine between each key's first and last observation,
  * linearly interpolating interior gaps. The standard pre-processing step
  * before rolling/EWMA statistics (which assume equally spaced samples) and
  * before any model that treats rows as fixed-rate ticks — the reference's
  * monthly-series queries assume the upstream source is already dense;
  * this operator is what makes that assumption true on real feeds.
  *
  * Scale shape: the spine is `explode(sequence(min, max))` per key —
  * generated distributed, never on the driver, bounded by the key's own
  * date range; gap filling is two window passes (ascending and descending)
  * over the SAME `(key)` partitioning, so the spine shuffles once and the
  * second pass is a sort within already-co-located partitions. Per-key
  * series are inherently sequential (a window over one key cannot split),
  * so key cardinality is the parallelism — at 100 TB that is metrics ×
  * entities, typically millions of keys, which parallelizes perfectly;
  * a single global series would serialize regardless of engine.
  *
  * Determinism: interpolation is per-row IEEE DOUBLE arithmetic in a fixed
  * expression shape (no accumulation order), so results are bit-identical
  * across partition counts and engines — the input means should come from
  * the decimal carrier ([[graft.functions.Fns.avgExact]]) like every
  * aggregate in this engine.
  */
object TimeSeries {

  /** Fill `daily` (one row per `(keyCol, dayCol)` observation, value in
    * `valCol`) onto the dense per-key day spine. Output:
    * `(keyCol, dayCol, filled, interpolated)` — `filled` is the observed
    * value on observed days and the linear interpolation between the
    * nearest observed neighbors on gap days; spine endpoints are observed
    * by construction (min/max come from observations), so every gap has
    * both neighbors and `filled` is never NULL. */
  def resampleLinear(daily: DataFrame, keyCol: String = "event_type",
                     dayCol: String = "day",
                     valCol: String = "v"): DataFrame = {
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__mn"), max(col(dayCol)).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"))).as(dayCol))
    val joined = spine.join(daily, Seq(keyCol, dayCol), "left")
    val wAsc = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wDesc = Window.partitionBy(col(keyCol)).orderBy(col(dayCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obs = when(col(valCol).isNotNull,
      struct(col(dayCol).as("d"), col(valCol).as("v")))
    joined
      .withColumn("__p", last(obs, ignoreNulls = true).over(wAsc))
      .withColumn("__n", last(obs, ignoreNulls = true).over(wDesc))
      .withColumn("filled",
        when(col(valCol).isNotNull, col(valCol).cast("double"))
          .otherwise(col("__p.v") + (col("__n.v") - col("__p.v")) *
            (datediff(col(dayCol), col("__p.d")).cast("double") /
              datediff(col("__n.d"), col("__p.d")).cast("double"))))
      .withColumn("interpolated", col(valCol).isNull)
      .select(col(keyCol), col(dayCol), col("filled"), col("interpolated"))
  }
}
