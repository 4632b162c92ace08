package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code: known small values and bit placement") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val got = df.select(
      ZOrder.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .as[Long].collect().toSeq
    // x occupies even bits, y odd bits: (1,0)->1, (0,1)->2, (3,3)->15,
    // (2,1)->0b0110=6
    assert(got === Seq(1L, 2L, 15L, 6L))
  }

  test("morton code is a bijection on the 32x32 grid") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zs = grid.select(ZOrder.zValue(Seq(col("x"), col("y")), 5).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length === 1024)
    assert(zs.min === 0L && zs.max === 1023L)
  }

  test("z-order layout prunes files on the NON-leading dim; 1-D sort cannot") {
    // rank-normalized dims (ZOrder.normalizeRank) so both FILL the grid —
    // the property under test needs the interleave, not a lopsided domain.
    // The metric is file-skipping: how many partitions' [min,max] d1 stats
    // intersect a narrow d1 predicate. A d0-sorted layout leaves every
    // partition spanning ~all of d1 (zero skipping); Morton ranges confine
    // d1 per partition, so most partitions prune away.
    val orders = sources.Tables.orders(spark, sf0001)
      .select(ZOrder.normalizeRank(col("o_custkey"), 10).as("d0"),
        ZOrder.normalizeRank(col("o_orderdate"), 10).as("d1"))
    def touched(df: org.apache.spark.sql.DataFrame, lo: Int, hi: Int): Long =
      df.groupBy(spark_partition_id().as("p"))
        .agg(min(col("d1")).as("mn"), max(col("d1")).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()
    val z = ZOrder.cluster(orders,
      ZOrder.zValue(Seq(col("d0"), col("d1")), 10), nFiles = 16).drop("__z")
    val oneD = orders.repartitionByRange(16, col("d0"))
      .sortWithinPartitions(col("d0"))
    val (zTouched, dTouched) = (touched(z, 300, 363), touched(oneD, 300, 363))
    assert(dTouched === 16L, s"expected the 1-D layout to skip nothing")
    assert(zTouched * 2 <= dTouched,
      s"z-order should confine a 64-wide d1 window to few files, got $zTouched")
  }
}
