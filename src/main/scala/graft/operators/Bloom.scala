package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExprs

/** Bloom-filter semi-join reduction — the runtime-filter discipline for
  * joins whose build side is too large to broadcast EXACTLY but whose
  * fixed-size bit vector is not (what Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects for shuffle
  * joins; re-expressed here declaratively so the filter composes with any
  * plan and stays deterministic for the oracle gate).
  *
  * The filter lives entirely IN the plan: the build side folds to a single
  * `m`-slot bit vector row (never collected to the driver), which a
  * broadcast nested-loop join ships to every probe-side task. Probe rows
  * failing any of the `k` membership bits drop before the join shuffle —
  * at 100 TB that is the difference between shuffling the whole fact table
  * and shuffling the ~selectivity fraction that can possibly match. False
  * positives survive the prefilter and are eliminated by the real join, so
  * the composed result is EXACTLY the plain join (which is the gate's
  * oracle).
  *
  * Hashing is FNV-1a64 over seeded strings ([[HashExprs.fnv1a64Col]]) —
  * deterministic across retries/cluster sizes and restatable in the DuckDB
  * oracle ([[graft.functions.SketchOracleSql.fnvFold]]). The vector is a
  * boolean array for plan clarity; a production packing to longs (64×
  * denser broadcast) changes only the element test, not the shape.
  */
object Bloom {

  /** Bit position `i` (0-based hash lane) for `key` in an `mBits` table
    * (INT-typed: both the dense-vector index and `element_at` want it). */
  private def bitPos(i: Int, key: Column, mBits: Int): Column =
    pmod(HashExprs.fnv1a64Col(
      concat(lit(s"bloom-$i|"), key.cast("string"))), lit(mBits)).cast("int")

  /** Fold the build side's `keyCol` into ONE row holding the dense
    * `mBits`-slot membership vector (`__bloom: array<boolean>`).
    * Two narrow shuffles over at most `k * distinct(key)` then `mBits`
    * rows; the result is a single broadcastable row. */
  def buildVector(keys: DataFrame, keyCol: String, mBits: Int,
                  k: Int): DataFrame = {
    require(k >= 1 && mBits >= 64, "need k >= 1 hash lanes, mBits >= 64")
    // Same power-of-two constraint as CountMin.bucket: bitPos reduces the
    // SIGNED fnv1a64 value with pmod while the oracle restatement reduces
    // the UNSIGNED value — they coincide exactly iff mBits divides 2^64.
    require((mBits & (mBits - 1)) == 0,
      s"bloom mBits must be a power of two (got $mBits)")
    val pos = keys
      .select(explode(array((0 until k).map(i =>
        bitPos(i, col(keyCol), mBits)): _*)).as("__pos"))
      .distinct()
    pos.agg(map_from_entries(collect_set(struct(col("__pos"), lit(true))))
        .as("__set"))
      .select(transform(sequence(lit(0), lit(mBits - 1)),
        i => coalesce(element_at(col("__set"), i), lit(false)))
        .as("__bloom"))
  }

  /** All `k` membership bits set for `key`? (AND of element tests.) */
  private def mightContain(bloom: Column, key: Column, mBits: Int,
                           k: Int): Column =
    (0 until k)
      .map(i => element_at(bloom, bitPos(i, key, mBits) + 1))
      .reduce(_ && _)

  /** Drop `probe` rows whose `keyCol` cannot be in `buildKeys`' key set.
    * Ships the vector via broadcast nested-loop (one row) — no shuffle of
    * `probe` is introduced; surviving rows still need the real join. */
  def prefilter(probe: DataFrame, probeKey: String, buildKeys: DataFrame,
                buildKey: String, mBits: Int = 1 << 12,
                k: Int = 3): DataFrame = {
    val vec = buildVector(buildKeys, buildKey, mBits, k)
    probe.crossJoin(broadcast(vec))
      .filter(mightContain(col("__bloom"), col(probeKey), mBits, k))
      .drop("__bloom")
  }
}
