package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout so that
  * range predicates on ANY clustered dimension prune files/row-groups, not
  * just the leading sort key (the OPTIMIZE ZORDER BY of Delta/Iceberg,
  * expressed as plain Spark: interleave → range-repartition → sorted
  * write).
  *
  * A 1-D sort gives perfect pruning on its leading key and NONE on the
  * rest: every file spans the full range of the second column. Interleaving
  * the bits of both keys keeps each file's bounding box small in ALL
  * dimensions — parquet min/max stats then skip files for predicates on
  * either column. At 100 TB the difference is scanning one dimension's
  * selectivity versus the intersection of all of them.
  *
  * The interleave is pure literal-shift bit arithmetic (`>>`, `&`, `<<`,
  * `|`) on pre-normalized non-negative ints — whole-stage-codegen'd, no
  * UDF, and restated verbatim in the DuckDB oracle.
  */
object ZOrder {

  /** Morton code of `dims` (each already normalized to [0, 2^bits)):
    * bit `b` of dim `d` lands at output position `b * dims.length + d`.
    * dims.length * bits must fit a signed long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2 && n * bits <= 62, s"need >=2 dims, n*bits<=62")
    val terms = for {
      (dim, d) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(dim.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same Morton code as DuckDB SQL over pre-normalized expressions. */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val n = dims.length
    (for {
      (dim, d) <- dims.zipWithIndex
      b <- 0 until bits
    } yield s"((($dim >> $b) & 1) << ${b * n + d})").mkString(" | ")
  }

  /** Cluster `df` into `nFiles` z-ordered ranges: range-repartition on the
    * z-value (contiguous Morton ranges per file → tight per-file bounding
    * boxes) and sort within each so row-group stats prune too. */
  def cluster(df: DataFrame, z: Column, nFiles: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))

  /** Rank-normalize a dimension onto [0, 2^bits) so it FILLS the Morton
    * grid — raw modulo/truncation leaves unused high bits whenever the
    * column's domain is narrower than 2^bits, and the interleave then
    * degenerates toward a 1-D sort on the wider dim (this is why Delta's
    * OPTIMIZE ZORDER range-partitions each column before interleaving).
    * ntile is exact and needs a total order; at cluster scale substitute
    * the sampled range bounds a RangePartitioner already computes. */
  def normalizeRank(dim: Column, bits: Int): Column =
    ntile(1 << bits).over(
      org.apache.spark.sql.expressions.Window.orderBy(dim)) - 1
}
