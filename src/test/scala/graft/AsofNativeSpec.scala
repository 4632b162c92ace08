package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.plans.AsofNative

/** The native as-of operator (custom LogicalPlan -> Strategy -> physical
  * merge): identical semantics to the composed union+window plan on
  * adversarial data, and the declared plan shape actually materializes. */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic adversarial fixture: null keys, null timestamps,
    * duplicate timestamps (tie-break), keys with no matches, and a key
    * present only on one side. */
  private def fixture: (DataFrame, DataFrame) = {
    def ts(s: Int) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (1L, Option(1L), Option(ts(10)), 1.0),
      (2L, Option(1L), Option(ts(20)), 2.0),
      (3L, Option(2L), Option(ts(5)), 3.0),   // before any right row
      (4L, Option(2L), Option(ts(100)), 4.0),
      (5L, None, Option(ts(50)), 5.0),        // null key
      (6L, Option(3L), None, 6.0),            // null ts -> null payload
      (7L, Option(9L), Option(ts(30)), 7.0),  // key absent on right
      (8L, Option(1L), Option(ts(15)), 8.0)   // equals a right ts (<=)
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (Option(1L), Option(ts(10)), 101L, 0.1),
      (Option(1L), Option(ts(15)), 102L, 0.2),
      (Option(1L), Option(ts(15)), 103L, 0.3), // tie: larger tieBreak wins
      (Option(2L), Option(ts(50)), 104L, 0.4),
      (Option(1L), None, 105L, 0.5),           // null right ts: never matches
      (None, Option(ts(40)), 106L, 0.6),       // null key group
      (Option(4L), Option(ts(1)), 107L, 0.7)   // key absent on left
    ).toDF("user_id", "ts", "click_id", "click_value")
    (left, right)
  }

  private def run(f: (DataFrame, DataFrame) => DataFrame): Seq[Row] = {
    val (l, r) = fixture
    f(l, r).select("event_id", "click_id", "click_value")
      .orderBy("event_id").collect().toSeq
  }
  private type Row = org.apache.spark.sql.Row

  test("native == composed on null keys/ts, ties, and unmatched keys") {
    val native = run((l, r) => AsofNative.join(l, r, Seq("user_id"),
      "ts", "ts", Seq("click_id", "click_value"), "click_id"))
    val composed = run((l, r) => AsofJoin.asofJoin(l, r, Seq("user_id"),
      "ts", "ts", Seq("click_id", "click_value"), "click_id"))
    assert(native == composed)
    // and the exact expected matches, to pin both implementations:
    val byId = native.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(byId == Map(1L -> 101L, 2L -> 103L, 3L -> -1L, 4L -> 104L,
      5L -> 106L, 6L -> -1L, 7L -> -1L, 8L -> 103L))
  }

  test("native == composed on the events fixture end to end") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("value").as("click_value"))
    val native = AsofNative.join(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id", "click_value"), "click_id")
      .orderBy("event_id").collect()
    val composed = AsofJoin.asofJoin(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id", "click_value"), "click_id")
      .select(purchases.columns.map(col) :+ col("click_id") :+
        col("click_value"): _*)
      .orderBy("event_id").collect()
    assert(native.sameElements(composed))
    assert(native.nonEmpty)
  }

  test("plan shape: the custom exec node plans, with one exchange + one " +
    "sort per side; a pre-partitioned side adds NO extra exchange") {
    val (l, r) = fixture
    val df = AsofNative.join(l, r, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("(?m)^.*Sort ".r.findAllIn(plan).size >= 2, plan)

    // the declared-distribution payoff the union+window plan can never
    // get: an already-hash-partitioned side needs no second shuffle
    val lPre = l.repartition(col("user_id"))
    val df2 = AsofNative.join(lPre, r, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id")
    val plan2 = df2.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan2).size == 2,
      s"pre-partitioned left must reuse its exchange:\n$plan2")
    assert(df2.orderBy("event_id").collect()
      .sameElements(df.orderBy("event_id").collect()))
  }

  test("autoJoin: a small right side takes the packed-array broadcast " +
    "equi-join (zero exchange/sort on the left), a big one the native " +
    "sweep — row-identical either way, including every adversarial case") {
    val (l, r) = fixture
    val native = run((a, b) => AsofNative.join(a, b, Seq("user_id"),
      "ts", "ts", Seq("click_id", "click_value"), "click_id"))

    val auto = AsofNative.autoJoin(l, r, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id")
    val bPlan = auto.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin") ||
      bPlan.contains("BroadcastNestedLoopJoin"),
      s"small right side must broadcast:\n$bPlan")
    assert(!bPlan.contains("AsofJoin"), s"must not plan the sweep:\n$bPlan")
    // the one allowed hash exchange feeds the SMALL side's collect_list
    // aggregate (bounded by the broadcast threshold); the left side rides
    // exchange- and sort-free — vs one exchange + one sort per side on
    // the sweep
    assert("Exchange hashpartitioning".r.findAllIn(bPlan).size <= 1,
      s"broadcast arm must leave the left side exchange-free:\n$bPlan")
    assert(!bPlan.contains("- Sort "),
      s"broadcast arm must not sort either side:\n$bPlan")
    assert(run((_, _) => auto) == native)

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = AsofNative.autoJoin(l, r, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_value"), "click_id")
      assert(big.queryExecution.executedPlan.toString.contains("AsofJoin"),
        "threshold off must pick the native sweep")
      assert(run((_, _) => big) == native)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("autoJoin validate=true: a duplicate (key, ts, tieBreak) right " +
    "row fails loudly on the broadcast arm; the clean fixture and the " +
    "null-ts tail still pass") {
    val (l, r) = fixture
    // the adversarial fixture is CLEAN under the contract (tieBreak
    // click_id unique per (user_id, ts)) and carries a null-ts right row
    // per key group — the zip_with padding false-positive trap
    val clean = AsofNative.autoJoin(l, r, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id", validate = true)
    val native = run((a, b) => AsofNative.join(a, b, Seq("user_id"),
      "ts", "ts", Seq("click_id", "click_value"), "click_id"))
    assert(run((_, _) => clean) == native)
    // plant a duplicate (user_id=1, ts=15, click_id=103): the packed
    // array sorts it adjacent to the existing 103 row — loud failure
    def ts(s: Int) = new java.sql.Timestamp(s * 1000L)
    val dup = r.unionByName(Seq((Option(1L), Option(ts(15)), 103L, 0.9))
      .toDF("user_id", "ts", "click_id", "click_value"))
    val e = intercept[Exception] {
      AsofNative.autoJoin(l, dup, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_value"), "click_id", validate = true)
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage +: Option(t.getCause).toSeq.map(rootMsg)).mkString("|")
    assert(rootMsg(e).contains("duplicate (key, ts, tieBreak)"), rootMsg(e))
    // validate = false (the default) keeps today's behavior: one of the
    // tied payloads, no failure
    assert(AsofNative.autoJoin(l, dup, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id").count() == l.count())
  }

  test("builder validation: missing columns, payload collisions, bad ts " +
    "types fail loudly") {
    val (l, r) = fixture
    intercept[IllegalArgumentException] {
      AsofNative.join(l, r, Seq("nope"), "ts", "ts", Seq("click_id"), "click_id")
    }
    intercept[IllegalArgumentException] {
      AsofNative.join(l, r.withColumnRenamed("click_id", "value"),
        Seq("user_id"), "ts", "ts", Seq("value"), "value")
    }
    intercept[IllegalArgumentException] {
      AsofNative.join(l, r, Seq("user_id"), "value", "ts",
        Seq("click_id"), "click_id") // double ts column
    }
  }
}
