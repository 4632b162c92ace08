package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** Closed-form checks for the exact two-sample KS test. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("KS closed form: A={1,2,3} vs B={3,4,5} -> D = 2/3, not rejected " +
    "at these tiny n") {
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (3.0, false), (4.0, false), (5.0, false)).toDF("v", "a")
    val r = Drift.ksTest(df, col("v"), col("a")).collect().head
    assert(r.getAs[Long]("n1") == 3 && r.getAs[Long]("n2") == 3)
    // max |c1*n2 - c2*n1|: at v=2 -> |2*3-0| = 6 (also 6 at v=3); den 9
    assert(r.getAs[Long]("ks_num") == 6)
    assert(r.getAs[Double]("ks_d") == 6.0 / 9.0)
    assert(!r.getAs[Boolean]("reject_h0"))
  }

  test("identical samples -> D = 0; disjoint samples -> D = 1 and " +
    "rejection at moderate n") {
    // pairs (2k, 2k+1) share a value with opposite flags -> the two
    // samples are literally the same multiset
    val same = Seq.tabulate(40)(i => ((i / 2 % 7).toDouble, i % 2 == 0))
      .toDF("v", "a")
    val r0 = Drift.ksTest(same, col("v"), col("a")).collect().head
    assert(r0.getAs[Long]("ks_num") == 0 && r0.getAs[Double]("ks_d") == 0.0)
    assert(!r0.getAs[Boolean]("reject_h0"))

    val disjoint = (Seq.tabulate(30)(i => (i.toDouble, true)) ++
      Seq.tabulate(30)(i => (100.0 + i, false))).toDF("v", "a")
    val r1 = Drift.ksTest(disjoint, col("v"), col("a")).collect().head
    assert(r1.getAs[Double]("ks_d") == 1.0)
    assert(r1.getAs[Boolean]("reject_h0"))
  }

  test("the 2^53 exactness guard actually fires — it rides the emitted " +
    "ks_num column, so Catalyst cannot prune it away") {
    // the guard expression itself, on counts too large to materialize as
    // real rows (n1*n2 = 4e16 > 2^53); below the bound it passes through
    val over = Seq((200000000L, 200000000L, 5L)).toDF("n1", "n2", "ks_num")
    val e = intercept[Exception] {
      over.select(Drift.guardedKsNum(col("n1"), col("n2"), col("ks_num"))
        .as("ks_num")).collect()
    }
    assert(e.getMessage.contains("2^53"), s"wrong error: ${e.getMessage}")
    val under = Seq((1000L, 1000L, 5L)).toDF("n1", "n2", "ks_num")
    assert(under.select(Drift.guardedKsNum(col("n1"), col("n2"),
      col("ks_num")).as("ks_num")).collect().head.getLong(0) == 5L)
  }

  test("ties across samples at the same value count into both ECDFs at " +
    "that value (no split-point double counting)") {
    // A = {1,1,2}, B = {1,2,2}: gaps at 1: |2*3-1*3|=3; at 2: 0
    val df = Seq((1.0, true), (1.0, true), (2.0, true),
      (1.0, false), (2.0, false), (2.0, false)).toDF("v", "a")
    val r = Drift.ksTest(df, col("v"), col("a")).collect().head
    assert(r.getAs[Long]("ks_num") == 3)
    assert(r.getAs[Double]("ks_d") == 3.0 / 9.0)
  }
}
