package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial radius join on integer planar coordinates — the classic
  * grid-file bin join (Bentley 1975's fixed-grid method; the pattern
  * behind every distributed spatial engine's partition join): snap each
  * point to a square cell of side = radius, explode ONE side into its
  * 3x3 cell neighborhood, equi-join on the cell key, then apply the
  * exact distance predicate. Any pair within `radius` necessarily lands
  * in the same or an adjacent cell, so the candidate set is complete;
  * each left point owns exactly one cell, so no pair is produced twice
  * (no dedup pass needed).
  *
  * Scale shape: the only shuffle is the cell-key equi-join — candidate
  * volume is bounded by local density x 9, never |L| x |R|; a 9x explode
  * of the smaller side is the entire blow-up. Skewed hot cells (urban
  * clusters) fall to AQE's skew-join splitting like any hot equi-join
  * key, or pre-salt the cell key. All arithmetic is integer (squared
  * L2 distance vs radius^2) — exact, overflow-safe for |coord| < 2^31,
  * and trivially engine-portable: the DuckDB oracle states the SAME
  * result as a brute-force distance filter, which is exactly the
  * correctness contract (the grid is an optimization, not a semantic). */
object SpatialJoin {

  /** All (left, right) pairs with squared L2 distance <= radius^2, with a
    * `dist2` column appended. Coordinate columns must be integral;
    * `floor`-division cell snapping handles negative coordinates. */
  def radiusJoin(left: DataFrame, right: DataFrame,
                 lx: Column, ly: Column, rx: Column, ry: Column,
                 radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val cell = lit(radius).cast("double")
    val l = left
      .withColumn("__cx", floor(lx / cell).cast("long"))
      .withColumn("__cy", floor(ly / cell).cast("long"))
    val offs = array((-1 to 1).map(o => lit(o.toLong)): _*)
    val r = right
      .withColumn("__dx", explode(offs))
      .withColumn("__dy", explode(offs))
      .withColumn("__cx", floor(rx / cell).cast("long") + col("__dx"))
      .withColumn("__cy", floor(ry / cell).cast("long") + col("__dy"))
      .drop("__dx", "__dy")
    val d2 = (lx.cast("long") - rx.cast("long")) *
      (lx.cast("long") - rx.cast("long")) +
      (ly.cast("long") - ry.cast("long")) *
        (ly.cast("long") - ry.cast("long"))
    l.join(r, Seq("__cx", "__cy"))
      .filter(d2 <= lit(radius * radius))
      .withColumn("dist2", d2)
      .drop("__cx", "__cy")
  }
}
