package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join.
  *
  * Spark plans a raw `lo <= p AND p <= hi` join as a broadcast nested loop —
  * O(|points| x |intervals|) comparisons, which dies when neither side is
  * tiny. This operator bins both sides into fixed-width buckets: a point
  * lands in one bucket, an interval is replicated into every bucket it
  * overlaps, and the join becomes a hash equi-join on the bucket id followed
  * by an exact filter. Candidate pairs are bounded by interval density per
  * bucket instead of |intervals|, and the single shuffle partitions on the
  * bucket id — the standard trick from interval-join literature (also how
  * Structured Streaming bounds stream-stream time-range joins).
  *
  * `bucketWidth` tunes replication vs selectivity: ~ the median interval
  * width is a good default (each interval lands in <= 2-3 buckets).
  */
object RangeJoin {

  /** Inner join of `points` to every interval with lo <= p <= hi.
    *
    * Guards: reversed intervals (hi < lo — they can never match) are
    * dropped instead of generating a descending bucket array; an interval
    * spanning more than `maxBucketsPerInterval` buckets fails fast with a
    * clear error — a sentinel hi like 1e15 would otherwise ask `sequence`
    * for a trillion-element array and kill the job opaquely (widen
    * `bucketWidth` or cap open-ended intervals instead). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__b",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__span", hiB - loB + 1)
      .withColumn("__b", explode(
        when(col("__span") > maxBucketsPerInterval,
          raise_error(concat(lit(s"range join: interval spans more than " +
            s"$maxBucketsPerInterval buckets of width $bucketWidth ("),
            col("__span"), lit(" buckets) — widen bucketWidth"))))
          .otherwise(sequence(loB, hiB))))
      .drop("__span")
    p.join(i, Seq("__b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Interval × interval overlap join: both sides replicate into the
    * fixed-width cells they cover and hash-join on the cell id, so
    * candidate pairs are bounded by per-cell density — never the cross
    * product a raw `aLo <= bHi AND bLo <= aHi` join plans. Each
    * overlapping pair shares every cell their intersection covers; instead
    * of a distinct shuffle, the pair is kept only in the ONE cell owning
    * the intersection's start (`floor(max(aLo,bLo)/W)`) — exactly-once
    * by construction, no dedup pass. Same guards as [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      aLo: String, aHi: String, bLo: String, bHi: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0)
    def cells(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loB = floor(col(lo) / bucketWidth).cast("long")
      val hiB = floor(col(hi) / bucketWidth).cast("long")
      df.filter(col(lo) <= col(hi))
        .withColumn("__span", hiB - loB + 1)
        .withColumn("__b", explode(
          when(col("__span") > maxBucketsPerInterval,
            raise_error(concat(lit(s"overlap join: interval spans more " +
              s"than $maxBucketsPerInterval buckets of width $bucketWidth " +
              "— widen bucketWidth"), lit(""))))
            .otherwise(sequence(loB, hiB))))
        .drop("__span")
    }
    cells(left, aLo, aHi).join(cells(right, bLo, bHi), Seq("__b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__b") === floor(greatest(col(aLo), col(bLo)) / bucketWidth)
          .cast("long"))
      .drop("__b")
  }
}
