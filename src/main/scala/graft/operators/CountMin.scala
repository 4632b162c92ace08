package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExprs

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
  * fixed-memory frequency summary for heavy-hitter detection over key
  * domains too large to count exactly in one pass at 100 TB.
  *
  * Shape: each row increments `depth` counters, one per seeded hash lane,
  * in a `depth × width` grid. The grouped grid is at most `depth * width`
  * rows REGARDLESS of input size or key cardinality — that is the whole
  * point: the shuffle after the map-side partial agg carries a bounded
  * sketch, not the key domain. A key's estimate is the MIN over its
  * `depth` buckets; it never undercounts (every occurrence landed in all
  * of the key's buckets), only overcounts on collisions — the one-sided
  * error the gate asserts.
  *
  * Hash lanes are seeded FNV-1a64 ([[HashExprs.fnv1a64Col]]), so the grid
  * is deterministic across retries/partitionings and the DuckDB oracle can
  * rebuild it bit-for-bit ([[graft.functions.SketchOracleSql.fnvFold]]).
  */
object CountMin {

  /** Bucket of `key` in hash lane `j` (0-based) for a `width`-slot row. */
  def bucket(j: Int, key: Column, width: Int): Column =
    pmod(HashExprs.fnv1a64Col(
      concat(lit(s"cms-$j|"), key.cast("string"))), lit(width))

  /** The sketch grid: one row per touched (lane, bucket) with its count.
    * One explode (×depth) then one bounded-output aggregation. */
  def sketch(df: DataFrame, keyCol: String, depth: Int,
             width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    // Power-of-two width only: bucket() reduces the SIGNED fnv1a64 value
    // with pmod, while the DuckDB oracle (SketchOracleSql.fnvFold) reduces
    // the UNSIGNED value mod width. The two agree exactly when width
    // divides 2^64 — i.e. width is a power of two — and silently diverge
    // otherwise.
    require((width & (width - 1)) == 0,
      s"CMS width must be a power of two (got $width): signed-pmod and " +
        "unsigned-mod bucket reduction only coincide for 2^k widths")
    df.select(posexplode(array((0 until depth).map(j =>
        bucket(j, col(keyCol), width)): _*)).as(Seq("__lane", "__bucket")))
      .groupBy(col("__lane"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
  }

  /** Point-estimate the frequency of each distinct key in `candidates`
    * (a small frame of `keyCol` values, e.g. sampled or exact-counted
    * heavy-hitter candidates): MIN over the key's `depth` buckets.
    * The sketch side is bounded, so the join broadcasts it.
    *
    * The grid only materializes TOUCHED (lane, bucket) cells, so the join
    * is a LEFT join with absent cells coalesced to 0: a candidate key that
    * never occurred in the sketched data hits at least one empty bucket
    * (w.h.p.) and estimates 0 — the standard CMS point-query contract.
    * An inner join here would instead inflate such a key's estimate to the
    * min over only its COLLIDING lanes, or drop the key entirely. */
  def estimate(candidates: DataFrame, keyCol: String, grid: DataFrame,
               depth: Int, width: Int): DataFrame = {
    val lanes = candidates
      .select(col(keyCol), posexplode(array((0 until depth).map(j =>
        bucket(j, col(keyCol), width)): _*)).as(Seq("__lane", "__bucket")))
    lanes.join(broadcast(grid), Seq("__lane", "__bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__n"), lit(0L))).as("cms_estimate"))
  }
}
