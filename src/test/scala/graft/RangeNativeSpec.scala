package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.plans.RangeNative

/** Native keyed point-in-interval join: parity with the encodable
  * bucketed shape, active-set sweep correctness on interleaved/nested
  * intervals, null semantics, and the declared-distribution plan shape
  * (one exchange per side, no interval replication). */
class RangeNativeSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    ("a", 1L, 5.0), ("a", 2L, 12.0), ("a", 3L, 16.0), ("a", 4L, 25.0),
    ("a", 5L, 35.0), ("a", 6L, 95.0), ("a", 7L, 101.0),
    ("b", 8L, 12.0), ("b", 9L, 50.0)
  ).toDF("k", "pid", "p")

  // interleaved + nested + point-width intervals, plus a key with
  // different bands — the active-set eviction order matters here
  private def intervals = Seq(
    ("a", 10L, 0.0, 100.0), ("a", 11L, 10.0, 20.0), ("a", 12L, 15.0, 90.0),
    ("a", 13L, 30.0, 40.0), ("a", 14L, 12.0, 12.0),
    ("b", 15L, 11.0, 13.0), ("b", 16L, 60.0, 70.0)
  ).toDF("k", "iid", "lo", "hi")

  private def got = RangeNative.join(points, intervals, keys = Seq("k"),
    pointCol = "p", loCol = "lo", hiCol = "hi", payload = Seq("iid"))
    .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("matches a brute-force keyed inequality join on interleaved and " +
    "nested intervals") {
    val want = points.as("l").join(intervals.as("r"),
        $"l.k" === $"r.k" && $"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
    // spot checks: nested interval matched, point-width interval matched,
    // cross-key band NOT matched
    assert(got.contains((2L, 14L)) && got.contains((3L, 11L)))
    assert(!got.contains((8L, 11L)), "'b' point must not hit an 'a' band")
  }

  test("parity with the encodable bucketed RangeJoin on per-key slices") {
    for (key <- Seq("a", "b")) {
      val enc = RangeJoin.pointInInterval(
          points.filter($"k" === key), intervals.filter($"k" === key),
          pointCol = "p", loCol = "lo", hiCol = "hi", bucketWidth = 7.0)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val nat = got.filter { case (pid, _) =>
        points.filter($"k" === key).select($"pid").as[Long].collect()
          .contains(pid)
      }
      assert(nat == enc, s"key $key: native $nat vs encodable $enc")
    }
  }

  test("LEFT OUTER: brute-force parity — matched pairs identical to " +
    "inner, unmatched and null points null-padded exactly once") {
    val withNull = points.unionByName(
      Seq(("a", 20L, Double.NaN)).toDF("k", "pid", "p")
        .withColumn("p", lit(null).cast("double")))
    val gotO = RangeNative.join(withNull, intervals, keys = Seq("k"),
        pointCol = "p", loCol = "lo", hiCol = "hi", payload = Seq("iid"),
        outer = true)
      .select($"pid", $"iid").as[(Long, Option[Long])].collect().toList
    val want = withNull.as("l").join(intervals.as("r"),
        $"l.k" === $"r.k" && $"p" >= $"lo" && $"p" <= $"hi", "left_outer")
      .select($"pid", $"iid").as[(Long, Option[Long])].collect().toList
    assert(gotO.sorted == want.sorted)
    // pid 7 (101.0) is past every 'a' band: padded; null point padded
    assert(gotO.contains((7L, None)) && gotO.contains((20L, None)))
    assert(gotO.count(_._1 == 7L) == 1)
  }

  test("autoJoin: a small interval side takes the broadcast predicate " +
    "plan, threshold -1 forces the native sweep; results identical") {
    val auto = RangeNative.autoJoin(points, intervals, Seq("k"),
      "p", "lo", "hi", Seq("iid"))
    val planSmall = auto.queryExecution.executedPlan.toString
    assert(planSmall.contains("Broadcast") && !planSmall.contains("RangeJoin "),
      planSmall)
    assert(auto.select($"pid", $"iid").as[(Long, Long)].collect().toSet == got)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val native = RangeNative.autoJoin(points, intervals, Seq("k"),
        "p", "lo", "hi", Seq("iid"))
      assert(native.queryExecution.executedPlan.toString.contains("RangeJoin "))
      assert(native.select($"pid", $"iid").as[(Long, Long)].collect().toSet
        == got)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    // outer parity through the broadcast path: null-padded rows match join()
    val autoOuter = RangeNative.autoJoin(points, intervals, Seq("k"),
        "p", "lo", "hi", Seq("iid"), outer = true)
      .select($"pid", $"iid").as[(Long, Option[Long])].collect().toList
    val nativeOuter = RangeNative.join(points, intervals, Seq("k"),
        "p", "lo", "hi", Seq("iid"), outer = true)
      .select($"pid", $"iid").as[(Long, Option[Long])].collect().toList
    assert(autoOuter.sorted == nativeOuter.sorted)
  }

  test("null point, null bounds, and null keys: nulls never match bounds; " +
    "null keys group together") {
    val p = Seq((Option("a"), 1L, Option(12.0)), (Option("a"), 2L, None),
      (Option.empty[String], 3L, Option(12.0)))
      .toDF("k", "pid", "p")
    val i = Seq((Option("a"), 10L, Option(10.0), Option(20.0)),
      (Option("a"), 11L, Option.empty[Double], Option(20.0)),
      (Option.empty[String], 12L, Option(10.0), Option(20.0)))
      .toDF("k", "iid", "lo", "hi")
    val r = RangeNative.join(p, i, Seq("k"), "p", "lo", "hi", Seq("iid"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 10L), (3L, 12L)),
      s"expected null-point and null-lo to drop, null keys to pair: $r")
  }

  test("plan: RangeJoinExec with ONE hash exchange per side and no " +
    "interval explosion; a pre-partitioned side adds no exchange") {
    val df = RangeNative.join(points, intervals, Seq("k"),
      "p", "lo", "hi", Seq("iid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin "), plan) // RangeJoinExec's nodeName
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.toLowerCase.contains("explode"), plan)
    // an aggregation output already clustered on the key joins with only
    // the interval side exchanged — the declared-distribution payoff the
    // union/explode shapes can never see
    val preParts = points.groupBy($"k").agg(max($"p").as("p"))
    val df2 = RangeNative.join(preParts, intervals, Seq("k"),
      "p", "lo", "hi", Seq("iid"))
    val plan2 = df2.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan2).size == 2,
      s"agg shuffle + right side only — the left side must reuse the " +
        s"aggregation's partitioning:\n$plan2")
    df2.collect() // and it executes
  }

  test("builder rejects mismatched bound types and payload collisions") {
    intercept[IllegalArgumentException] {
      RangeNative.join(points, intervals.withColumn("lo", $"lo".cast("int")),
        Seq("k"), "p", "lo", "hi", Seq("iid"))
    }
    intercept[IllegalArgumentException] {
      RangeNative.join(points, intervals.withColumnRenamed("iid", "pid"),
        Seq("k"), "p", "lo", "hi", Seq("pid"))
    }
  }
}
