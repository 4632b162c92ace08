package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Date-spine resample + linear interpolation semantics. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("gaps are filled linearly between observed neighbors; endpoints observed") {
    val daily = Seq(
      ("a", d("2024-01-01"), 10.0),
      ("a", d("2024-01-04"), 40.0), // gap of 2 days -> 20, 30
      ("a", d("2024-01-05"), 0.0)
    ).toDF("event_type", "day", "v")
    val got = TimeSeries.resampleLinear(daily)
      .orderBy("day")
      .collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 10.0, false),
      ("2024-01-02", 20.0, true),
      ("2024-01-03", 30.0, true),
      ("2024-01-04", 40.0, false),
      ("2024-01-05", 0.0, false)))
  }

  test("per-key spines are independent; single-observation key yields one row") {
    val daily = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-03"), 3.0),
      ("b", d("2024-02-10"), 7.0) // lone observation: spine is that one day
    ).toDF("event_type", "day", "v")
    val got = TimeSeries.resampleLinear(daily).collect()
    assert(got.length == 4)
    val b = got.filter(_.getString(0) == "b")
    assert(b.length == 1 && b.head.getDouble(2) == 7.0 && !b.head.getBoolean(3))
    // no NULL fills anywhere (endpoints are observed by construction)
    assert(got.forall(r => !r.isNullAt(2)))
  }

  test("filled values are exact where arithmetic is exact (quarter steps)") {
    val daily = Seq(
      ("k", d("2024-03-01"), 0.0),
      ("k", d("2024-03-05"), 1.0) // 4-day span -> 0.25 steps
    ).toDF("event_type", "day", "v")
    val got = TimeSeries.resampleLinear(daily)
      .orderBy("day").collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
  }
}
