package graft

import graft.operators.Packing

/** Sequence packing: exclusive-prefix chunking semantics, shard isolation,
  * NULL-token docs occupy slots without consuming budget. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // 4-token docs against a 10-token budget: cum-before 0,4,8,12,16 ->
  // bins 0,0,0,1,1
  private lazy val docs = (1L to 5L)
    .map(i => ("s1", i, "one two three four")).toDF("source", "doc_id", "text")

  test("exclusive-prefix chunking: first doc always bin 0, overshoot bounded") {
    val bins = Packing.packBins(docs, budget = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("shards pack independently") {
    val two = docs.union(Seq(("s2", 1L, "one two three four")).toDF("source", "doc_id", "text"))
    val stats = Packing.packStats(two, budget = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(stats == Map(("s1", 0L) -> 3L, ("s1", 1L) -> 2L, ("s2", 0L) -> 1L))
  }

  test("property: bins are contiguous, monotone, and exclusive-prefix exact " +
      "on random corpora") {
    val rnd = new scala.util.Random(31)
    val budget = 25
    val docs = (0 until 80).map { i =>
      (s"s${rnd.nextInt(3)}", i.toLong,
        Seq.fill(1 + rnd.nextInt(12))("w").mkString(" "))
    }
    val got = Packing.packBins(docs.toDF("source", "doc_id", "text"), budget = budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, _, nToks, bin) =>
        assert(bin == cum / budget) // exclusive prefix
        cum += nToks
      }
      // bins form a non-decreasing contiguous sequence starting at 0
      val bins = sorted.map(_._4)
      assert(bins.head == 0L && bins.zip(bins.tail).forall { case (a, b) => b == a || b > a })
    }
  }

  test("packBinsOrdered packs in the EXPLICIT (order-col, id) order within " +
      "each shard — curriculum stage/bucket packing semantics") {
    // shard A: order key reverses the id order, 4 toks each, budget 10 ->
    // walk order by ord asc is id 3 (cum 0), id 2 (cum 4), id 1 (cum 8):
    // bins 0,0,0... use budget 6: cums 0,4,8 -> bins 0,0,1 land on ids
    // 3,2,1 respectively
    val df = Seq(
      ("A", 1L, 30L, 4L), ("A", 2L, 20L, 4L), ("A", 3L, 10L, 4L),
      ("B", 9L, 5L, 4L)
    ).toDF("stage", "doc_id", "ord", "n_toks")
    val out = Packing.packBinsOrdered(df, shardCol = "stage",
        orderCols = Seq("ord", "doc_id"), nToksCol = "n_toks", budget = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out == Map(("A", 3L) -> 0L, ("A", 2L) -> 0L, ("A", 1L) -> 1L,
      ("B", 9L) -> 0L))
  }

  test("packConcat joins bin members in doc order with the separator") {
    val two = Seq(
      ("s1", 1L, "aaa bbb ccc ddd"), ("s1", 2L, "eee fff ggg hhh"),
      ("s1", 3L, "iii jjj kkk lll")
    ).toDF("source", "doc_id", "text")
    val got = Packing.packConcat(two, budget = 10, sep = "|")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // 4-token docs, budget 10: docs 1,2,3 have cum-before 0,4,8 -> bin 0,0,0
    assert(got == Map(("s1", 0L) -> ("aaa bbb ccc ddd|eee fff ggg hhh|iii jjj kkk lll", 3L)))
  }

  test("NULL text occupies a slot without consuming budget") {
    val withNull = Seq(
      ("s1", 1L, "one two three four five six"), // 6 toks
      ("s1", 2L, null.asInstanceOf[String]),     // NULL, consumes nothing
      ("s1", 3L, "one two three four five six")  // cum-before 6 -> bin 0
    ).toDF("source", "doc_id", "text")
    val bins = Packing.packBins(withNull, budget = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
    val stats = Packing.packStats(withNull, budget = 10).collect()
    assert(stats.length == 1 && stats.head.getLong(3) == 12L) // bin_tokens skips NULL
  }
}
