package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** As-of join semantics: latest right row with ts <= left.ts per key. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(1700000000000L + ms)

  test("picks latest prior right row; same-instant right row is visible; " +
    "no prior -> null") {
    val left = Seq(
      (1L, 7L, t(1000), 10.0),  // after r2 -> r2
      (2L, 7L, t(500), 20.0),   // exactly at r2 -> r2 (<= semantics)
      (3L, 7L, t(100), 30.0),   // before any right row -> null
      (4L, 8L, t(9999), 40.0)   // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 7L, t(200), 1.0),  // r1
      (102L, 7L, t(500), 2.0)   // r2
    ).toDF("click_id", "user_id", "ts", "click_value")

    val out = AsofJoin.asofJoin(left, right, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        payload = Seq("click_id", "click_value"), tieBreak = "click_id")
      .orderBy("event_id")
      .select("event_id", "click_id", "click_value").collect()

    assert(out(0).getLong(1) == 102L && out(0).getDouble(2) == 2.0)
    assert(out(1).getLong(1) == 102L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    assert(out(3).isNullAt(1))
  }

  test("tolerance nulls the payload when the matched row is too stale, " +
    "keeps matches exactly AT the bound, and still nulls no-match rows") {
    val left = Seq(
      (1L, 7L, t(1000), 10.0), // latest prior r2@500, delta 500ms -> kept
      (2L, 7L, t(5000), 20.0), // latest prior r2@500, delta 4500ms -> nulled
      (3L, 7L, t(1500), 30.0), // delta exactly 1000ms -> kept (<= bound)
      (4L, 8L, t(100), 40.0)   // no prior right row -> null
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 7L, t(200), 1.0),
      (102L, 7L, t(500), 2.0)
    ).toDF("click_id", "user_id", "ts", "click_value")
    val out = AsofJoin.asofJoin(left, right, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        payload = Seq("click_id", "click_value"), tieBreak = "click_id",
        toleranceMicros = Some(1000L * 1000))
      .orderBy("event_id")
      .select("event_id", "click_id", "click_value").collect()
    assert(out(0).getLong(1) == 102L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).getLong(1) == 102L)
    assert(out(3).isNullAt(1))
  }

  test("nearest direction picks the closer of backward/forward matches; " +
    "exact ties prefer backward; one-sided rows fall back to that side") {
    val left = Seq(
      (1L, 7L, t(600), 10.0),  // r1@200 (d=400) vs r2@900 (d=300) -> forward r2
      (2L, 7L, t(400), 20.0),  // r1@200 (d=200) vs r2@900 (d=500) -> backward r1
      (3L, 7L, t(550), 30.0),  // tie d=350 both sides? r1 d=350, r2 d=350 -> backward r1
      (4L, 7L, t(100), 40.0),  // before all -> forward r1
      (5L, 7L, t(2000), 50.0), // after all -> backward r2
      (6L, 8L, t(500), 60.0)   // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 7L, t(200), 1.0), // r1
      (102L, 7L, t(900), 2.0)  // r2
    ).toDF("click_id", "user_id", "ts", "click_value")
    val out = AsofJoin.asofJoinNearest(left, right, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        payload = Seq("click_id", "click_value"), tieBreak = "click_id")
      .orderBy("event_id")
      .select("event_id", "click_id").collect()
    assert(out(0).getLong(1) == 102L)
    assert(out(1).getLong(1) == 101L)
    assert(out(2).getLong(1) == 101L) // tie -> backward
    assert(out(3).getLong(1) == 101L)
    assert(out(4).getLong(1) == 102L)
    assert(out(5).isNullAt(1))
  }

  test("forward direction picks earliest at-or-after right row; " +
    "no later right -> null") {
    val left = Seq(
      (1L, 7L, t(1000), 10.0), // after every right -> null
      (2L, 7L, t(500), 20.0),  // exactly at r2 -> r2 (>= semantics)
      (3L, 7L, t(100), 30.0),  // before r1 -> r1 (nearest future)
      (4L, 8L, t(1), 40.0)     // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 7L, t(200), 1.0),
      (102L, 7L, t(500), 2.0)
    ).toDF("click_id", "user_id", "ts", "click_value")

    val out = AsofJoin.asofJoin(left, right, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        payload = Seq("click_id", "click_value"), tieBreak = "click_id",
        direction = "forward")
      .orderBy("event_id")
      .select("event_id", "click_id", "click_value").collect()

    assert(out(0).isNullAt(1), "left row after every right must get null")
    assert(out(1).getLong(1) == 102L, ">= semantics: same-instant right wins")
    assert(out(2).getLong(1) == 101L, "nearest FUTURE right, not the latest")
    assert(out(3).isNullAt(1), "key with no right rows must get null")
  }

  test("right rows sharing a timestamp resolve to the largest tieBreak") {
    val left = Seq((1L, 7L, t(1000), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (5L, 7L, t(500), 5.0),
      (9L, 7L, t(500), 9.0),
      (2L, 7L, t(500), 2.0)
    ).toDF("click_id", "user_id", "ts", "click_value")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id").collect()
    assert(out.head.getAs[Long]("click_id") == 9L)
    assert(out.head.getAs[Double]("click_value") == 9.0)
  }

  test("null field in the latest right row stays null (no value stitched " +
    "from an older row)") {
    val left = Seq((1L, 7L, t(1000), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (10L, 7L, t(100), Some(5.0)),   // older row, non-null value
      (11L, 7L, t(500), None)         // latest row, NULL value
    ).toDF("click_id", "user_id", "ts", "click_value")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id").collect().head
    assert(out.getAs[Long]("click_id") == 11L)
    assert(out.isNullAt(out.fieldIndex("click_value")),
      "payload must come from ONE row — not a franken-row mixing 10 and 11")
  }

  test("property: asofJoin == naive per-row latest-prior lookup on random data") {
    val rnd = new scala.util.Random(7)
    val lefts = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, t(rnd.nextInt(1000) * 100L),
        rnd.nextDouble()))
    val rights = (1 to 300).map(i =>
      ((i + 1000).toLong, (rnd.nextInt(5) + 1).toLong,
        t(rnd.nextInt(1000) * 100L), rnd.nextDouble()))
    val left = lefts.toDF("event_id", "user_id", "ts", "value")
    val right = rights.toDF("click_id", "user_id", "ts", "click_value")

    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_value"), "click_id")
      .select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    lefts.foreach { case (eid, uid, lts, _) =>
      val expected = rights
        .filter(r => r._2 == uid && !r._3.after(lts))
        .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
      assert(got(eid) == expected, s"event $eid: got ${got(eid)}, want $expected")
    }
  }

  test("property: bucketed range join == naive on random intervals") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 400 - 50))
      .toDF("event_id", "value")
    val bands = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 350 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 60)
    }.toDF("band_id", "lo", "hi")
    val naive = points.join(bands,
        col("value") >= col("lo") && col("value") <= col("hi"))
      .select("event_id", "band_id").orderBy("event_id", "band_id").collect()
    val bucketed = graft.operators.RangeJoin.pointInInterval(
        points, bands, "value", "lo", "hi", bucketWidth = 40.0)
      .select("event_id", "band_id").orderBy("event_id", "band_id").collect()
    assert(naive.length > 100 && bucketed.sameElements(naive))
  }

  test("property: cell-bucketed overlap join == naive, with zero duplicate pairs") {
    val rnd = new scala.util.Random(17)
    val a = (1 to 300).map { i =>
      val lo = rnd.nextDouble() * 900
      (i.toLong, lo, lo + rnd.nextDouble() * 80)
    }.toDF("a_id", "a_lo", "a_hi")
    val b = (1 to 120).map { i =>
      val lo = rnd.nextDouble() * 900
      (i.toLong, lo, lo + rnd.nextDouble() * 120)
    }.toDF("b_id", "b_lo", "b_hi")
    val naive = a.join(b, col("a_lo") <= col("b_hi") &&
        col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").orderBy("a_id", "b_id").collect()
    val got = graft.operators.RangeJoin.intervalOverlap(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 50.0)
      .select("a_id", "b_id").orderBy("a_id", "b_id").collect()
    // exactly-once by owning-cell construction: counts must match the
    // naive join EXACTLY (a duplicated pair would show up here)
    assert(naive.length > 500 && got.sameElements(naive))
  }

  test("containment verify: planted prefix-copy scores ~1, disjoint docs 0") {
    import graft.functions.TextExprs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "entirely different content with no shared substrings at all"))
      .toDF("doc_id", "text")
    val prefix = Seq((101L,
      "the quick brown fox jumps over")).toDF("doc_id", "text")
    val corpus = docs.unionByName(prefix)
    val grams = corpus.select(col("doc_id"),
      transform(TextExprs.charShingles(col("text"), 5),
        sh => xxhash64(sh)).as("sh"))
    val pairs = Seq((101L, 1L), (101L, 2L)).toDF("a", "b")
    val got = graft.operators.Dedup
      .containmentVerify(pairs, grams, "doc_id", threshold = 0.0)
      .orderBy(col("b")).collect()
    assert(got.length === 2)
    assert(got(0).getDouble(2) === 1.0)     // prefix fully contained in doc 1
    assert(got(1).getDouble(2) === 0.0)     // nothing shared with doc 2
  }

  test("approx_count_distinct is within 5% of exact on events user_id") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val r = ev.agg(approx_count_distinct(col("user_id")).as("a"),
      countDistinct(col("user_id")).as("e")).collect().head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.05, s"approx=$a exact=$e")
  }
}
