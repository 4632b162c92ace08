package graft

import graft.operators.Profile

/** One-scan profile: exact nulls/distincts/min/max per column. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and distincts exactly, min/max as strings") {
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (None, "b"), (Some(3L), "c")
    ).toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = got("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    assert(k.getString(4) == "1" && k.getString(5) == "3")
    val s = got("s")
    assert(s.getLong(2) == 0 && s.getLong(3) == 3)
    assert(s.getString(4) == "a" && s.getString(5) == "c")
  }

  test("no Expand in the plan: per-column branches, not fused distinct-aggs") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val plan = Profile.profile(df, Seq("k", "s")).queryExecution.executedPlan.toString
    // a fused multi-distinct aggregation would plan an Expand that
    // duplicates every row (cols+1)x before the shuffle — the measured
    // 6x slowdown this operator's shape exists to avoid
    assert(!plan.contains("Expand"), plan)
  }
}
