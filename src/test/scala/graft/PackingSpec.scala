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
