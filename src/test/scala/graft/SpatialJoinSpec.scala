package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

/** Grid bin join == brute force, including cell-boundary and negative
  * coordinate cases. */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(left: Seq[(Long, Long, Long)],
                    right: Seq[(Long, Long, Long)], r: Long) =
    (for ((lid, lx, ly) <- left; (rid, rx, ry) <- right
          if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= r * r)
      yield (lid, rid, (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry))).toSet

  private def run(left: Seq[(Long, Long, Long)],
                  right: Seq[(Long, Long, Long)], r: Long) =
    SpatialJoin.radiusJoin(
        left.toDF("lid", "lx", "ly"), right.toDF("rid", "rx", "ry"),
        col("lx"), col("ly"), col("rx"), col("ry"), r)
      .select("lid", "rid", "dist2").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))

  test("grid join == brute force on a deterministic scattered set, " +
    "each pair exactly once") {
    val left = Seq.tabulate(200)(i =>
      (i.toLong, (i * 2654435761L) % 1000L, (i * 2246822519L) % 1000L))
    val right = Seq.tabulate(60)(i =>
      (1000L + i, (i * 3266489917L) % 1000L, (i * 668265263L) % 1000L))
    val got = run(left, right, 90L)
    assert(got.toSet == brute(left, right, 90L))
    assert(got.length == got.toSet.size) // no duplicate candidate pairs
    assert(got.nonEmpty)
  }

  test("boundary semantics: dist == radius included; adjacent-cell " +
    "neighbors found; beyond-adjacent excluded by distance") {
    val left = Seq((1L, 0L, 0L))
    // (3,4) at exact distance 5; (9,0) in a non-adjacent cell for r=5
    val right = Seq((10L, 3L, 4L), (11L, 9L, 0L), (12L, 5L, 0L))
    val got = run(left, right, 5L)
    assert(got.toSet == Set((1L, 10L, 25L), (1L, 12L, 25L)))
  }

  test("negative coordinates snap with floor division (no pair missed " +
    "across the origin)") {
    val left = Seq((1L, -3L, -3L))
    val right = Seq((2L, 2L, 2L), (3L, -12L, -3L))
    // dist((-3,-3),(2,2))^2 = 50 <= 64; (-12,-3) at dist 9 > 8
    assert(run(left, right, 8L).toSet == Set((1L, 2L, 50L)))
    assert(brute(left, right, 8L) == Set((1L, 2L, 50L)))
  }
}
