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

  // ---- holtLinear: fixed-point Holt recurrence --------------------------

  /** Reference fold in plain Scala: the exact integer recurrence the
    * operator claims (floor-halving in micro-units, init l=y2, b=y2-y1). */
  private def holtRef(ys: Seq[Long]): (Long, Long) = {
    def half(x: Long): Long = Math.floorDiv(x, 2L)
    var l = ys(1); var b = ys(1) - ys(0)
    ys.drop(2).foreach { y =>
      val l1 = half(y + l + b); b = half(l1 - l + b); l = l1
    }
    (l, b)
  }

  test("holtLinear matches the exact integer fold and the h-step forecast") {
    val ys = Seq(10000000L, 12000000L, 9000000L, 15000000L, 11000001L)
    val daily = ys.zipWithIndex.map { case (v, i) =>
      ("k", d(f"2024-01-${i + 1}%02d"), v)
    }.toDF("event_type", "day", "v")
    val r = TimeSeries.holtLinear(daily).collect().head
    val (l, b) = holtRef(ys)
    assert(r.getInt(1) == 5)
    assert(r.getDouble(2) == l / 1e6)
    assert(r.getDouble(3) == b / 1e6)
    assert(r.getDouble(4) == (l + 3 * b) / 1e6)
  }

  test("holtLinear floor-halving is exact for negative trend states") {
    // y2 < y1 makes b negative from the start; odd sums exercise the
    // floor (not truncate-toward-zero) branch of the halving
    val ys = Seq(5000001L, 2000000L, 1000001L, 999999L)
    val daily = ys.zipWithIndex.map { case (v, i) =>
      ("k", d(f"2024-02-${i + 1}%02d"), v)
    }.toDF("event_type", "day", "v")
    val r = TimeSeries.holtLinear(daily).collect().head
    val (l, b) = holtRef(ys)
    assert(r.getDouble(2) == l / 1e6 && r.getDouble(3) == b / 1e6)
    assert(b < 0, "fixture must exercise a negative trend")
  }

  // ---- seasonalDecompose: additive decomposition ------------------------

  test("seasonalDecompose recovers a planted weekly pattern exactly") {
    // constant base + zero-sum period-7 pattern: the centered 7-day MA
    // sees each day-of-week exactly once, so trend == base, seasonal ==
    // the pattern, residual == 0 — all exactly, in integer micro-units
    val base = 10000000L
    val pat = Seq(700000L, -700000L, 1400000L, -1400000L, 2100000L,
      -2100000L, 0L)
    val daily = (0 until 21).map { i =>
      ("k", d(f"2024-01-${i + 1}%02d"), base + pat(i % 7))
    }.toDF("event_type", "day", "v")
    val got = TimeSeries.seasonalDecompose(daily).orderBy("day").collect()
    assert(got.length == 15) // 21 minus 3 truncated edge days each side
    got.foreach { r =>
      assert(r.getDouble(3) == 10.0, "trend must equal the base")
      assert(r.getDouble(5) == 0.0, "residual must vanish")
      assert(r.getDouble(2) == r.getDouble(3) + r.getDouble(4))
    }
    // 2024-01-04 is day index 3 of the pattern
    assert(got.head.getDouble(4) == pat(3) / 1e6)
  }

  test("seasonalDecompose identity value = trend + seasonal + residual") {
    val ys = Seq(3L, 14L, 9L, 27L, 5L, 18L, 2L, 31L, 7L, 12L, 25L, 4L)
      .map(_ * 1000001L) // awkward micro values, not multiples of 7
    val daily = ys.zipWithIndex.map { case (v, i) =>
      ("k", d(f"2024-03-${i + 1}%02d"), v)
    }.toDF("event_type", "day", "v")
    val got = TimeSeries.seasonalDecompose(daily).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val Seq(v, t, s, res) =
        Seq(2, 3, 4, 5).map(i => math.round(r.getDouble(i) * 1e6))
      assert(v == t + s + res, s"identity broken at $r")
    }
  }

  test("madAnomalies flags a planted spike and stays silent on clean data") {
    val base = 10000000L
    val pat = Seq(700000L, -700000L, 1400000L, -1400000L, 2100000L,
      -2100000L, 0L)
    def series(spikeAt: Option[Int]) = (0 until 28).map { i =>
      val spike = if (spikeAt.contains(i)) 50000000L else 0L
      ("k", d(f"2024-01-${i + 1}%02d"), base + pat(i % 7) + spike)
    }.toDF("event_type", "day", "v")

    val clean = TimeSeries.madAnomalies(series(None)).collect()
    assert(clean.nonEmpty && clean.forall(!_.getBoolean(5)),
      "perfectly periodic series must produce zero anomalies")

    val spiked = TimeSeries.madAnomalies(series(Some(14))).collect()
    val flaggedDays = spiked.filter(_.getBoolean(5)).map(_.getDate(1).toString)
    assert(flaggedDays.contains("2024-01-15"), "the spiked day must flag")
    // the spiked day carries the largest absolute deviation
    val maxDev = spiked.maxBy(r => math.abs(r.getDouble(3)))
    assert(maxDev.getDate(1).toString == "2024-01-15")
  }

  test("cusumChangePoint finds a planted level shift at the exact split, " +
    "ties break to the earliest day, single-obs keys drop") {
    val shift = (1 to 6).map(i =>
      ("s", d(f"2024-01-$i%02d"), if (i <= 3) 100L else 500L))
    val tied = Seq(("t", d("2024-01-01"), 0L), ("t", d("2024-01-02"), 10L),
      ("t", d("2024-01-03"), 0L), ("t", d("2024-01-04"), 10L))
    val lone = Seq(("u", d("2024-01-01"), 42L))
    val got = TimeSeries.cusumChangePoint(
        (shift ++ tied ++ lone).toDF("event_type", "day", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!got.contains("u"), "a 1-row series has no interior split")
    val s = got("s")
    // P = [100..1800]; D_k = 6*P_k - k*1800 peaks at |D_3| = 3600
    assert(s.getAs[Long]("cp_idx") == 3L &&
      s.getAs[Long]("d_max") == 3600L)
    assert(s.getAs[java.sql.Date]("cp_day").toString == "2024-01-03")
    assert(s.getAs[Long]("mean_before_micro") == 100L &&
      s.getAs[Long]("mean_after_micro") == 500L)
    // |D| = 20 at both k=1 and k=3: earliest wins; floor mean 20 div 3
    val t = got("t")
    assert(t.getAs[Long]("cp_idx") == 1L &&
      t.getAs[Long]("mean_after_micro") == 6L)
  }

  test("cusumChangePoint fails LOUDLY on negative values (the floored-mean " +
    "engine contract) and the guard survives column pruning") {
    val neg = Seq(("n", d("2024-01-01"), 5L), ("n", d("2024-01-02"), -1L),
      ("n", d("2024-01-03"), 7L)).toDF("event_type", "day", "v")
    val e = intercept[Exception] {
      TimeSeries.cusumChangePoint(neg).collect()
    }
    assert(e.getMessage.contains("negative values") ||
      Option(e.getCause).exists(_.getMessage.contains("negative values")),
      s"unexpected failure: ${e.getMessage}")
    // pruning the means must not prune the guard (it rides d_max)
    val e2 = intercept[Exception] {
      TimeSeries.cusumChangePoint(neg).select(col("d_max")).collect()
    }
    assert(e2.getMessage.contains("negative values") ||
      Option(e2.getCause).exists(_.getMessage.contains("negative values")))
  }

  test("holtLinear keeps n==2 keys at their init state and drops n==1 keys") {
    val daily = Seq(
      ("two", d("2024-01-01"), 3000000L),
      ("two", d("2024-01-02"), 7000000L),
      ("one", d("2024-01-01"), 5000000L)
    ).toDF("event_type", "day", "v")
    val got = TimeSeries.holtLinear(daily).collect()
    assert(got.length == 1 && got.head.getString(0) == "two")
    assert(got.head.getDouble(2) == 7.0 && got.head.getDouble(3) == 4.0)
    assert(got.head.getDouble(4) == 19.0) // l + 3b = 7 + 12
  }

  private def acfEvents(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
    counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(("g", f"2024-02-${i + 1}%02d 09:00:00"))
    }.toDF("g", "s").withColumn("ts", col("s").cast("timestamp"))

  test("acf closed forms: an alternating daily series is -1 at lag 1 " +
    "and +1 at lag 2") {
    val by = TimeSeries.acfDaily(acfEvents(Seq(1, 3, 1, 3, 1)),
        col("g"), col("ts"), maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    // acf is the fixed IEEE tree num/(sqrt(denX)*sqrt(denY)) — an ulp
    // off the algebraic ±1; pin the tree, not the algebra
    def tree(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long,
             syy: Long): Double =
      (n.toDouble * sxy - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx - sx.toDouble * sx.toDouble) *
          math.sqrt(n.toDouble * syy - sy.toDouble * sy.toDouble))
    val l1 = by(1L)
    assert(l1.getAs[Long]("n") == 4)
    // pairs (1,3),(3,1),(1,3),(3,1): sx=8 sy=8 sxy=12 sxx=20 syy=20
    assert(l1.getAs[Double]("acf") == tree(4, 8, 8, 12, 20, 20))
    assert(math.abs(l1.getAs[Double]("acf") + 1.0) < 1e-12)
    val l2 = by(2L)
    assert(l2.getAs[Long]("n") == 3)
    // pairs (1,1),(3,3),(1,1): sx=5 sy=5 sxy=11 sxx=11 syy=11
    assert(l2.getAs[Double]("acf") == tree(3, 5, 5, 11, 11, 11))
    assert(math.abs(l2.getAs[Double]("acf") - 1.0) < 1e-12)
  }

  test("cross-correlation finds the planted lead: B = A delayed one day " +
    "peaks at lag +1 with xcf == the IEEE tree of a perfect fit") {
    // A on days 1..5 with counts 1,3,2,5,4; B identical but one day later
    val aCounts = Seq(1, 3, 2, 5, 4)
    val rows =
      aCounts.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(("A", f"2024-03-${i + 1}%02d 12:00:00"))
      } ++ aCounts.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(("B", f"2024-03-${i + 2}%02d 12:00:00"))
      }
    val df = rows.toDF("g", "s").withColumn("ts", col("s").cast("timestamp"))
    val by = TimeSeries.crossCorrDaily(df, col("g"), col("ts"),
        keyA = "A", keyB = "B", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    val atPlus1 = by(1L)
    assert(atPlus1.getAs[Long]("n") == 5)
    // perfect alignment: x == y pairwise -> sxy = sxx = syy, sx = sy
    assert(atPlus1.getAs[Long]("sxy") == atPlus1.getAs[Long]("sxx"))
    val n = atPlus1.getAs[Long]("n").toDouble
    val sx = atPlus1.getAs[Long]("sx").toDouble
    val sxx = atPlus1.getAs[Long]("sxx").toDouble
    val expect = (n * sxx - sx * sx) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * sxx - sx * sx))
    assert(atPlus1.getAs[Double]("xcf") == expect)
    assert(math.abs(atPlus1.getAs[Double]("xcf") - 1.0) < 1e-12)
    // every other lag has fewer aligned days and a weaker fit
    assert(by(0L).getAs[Long]("n") == 4)
    assert(math.abs(by(0L).getAs[Double]("xcf")) < 0.999)
  }

  test("acf lag pairing is calendar-joined: a missing day DROPS its " +
    "pairs instead of row-shifting the series") {
    // days 1,2,4,5 present (day 3 absent): lag-1 pairs are (1,2),(4,5)
    val df = acfEvents(Seq(1, 2, 0, 4, 5))
    val by = TimeSeries.acfDaily(df, col("g"), col("ts"), maxLag = 1)
      .collect()
    assert(by.length == 1 && by.head.getAs[Long]("n") == 2)
    // and a constant series guards to NULL, never NaN
    val const = TimeSeries.acfDaily(acfEvents(Seq(2, 2, 2)),
      col("g"), col("ts"), maxLag = 1).collect().head
    assert(const.isNullAt(const.fieldIndex("acf")))
  }
}
