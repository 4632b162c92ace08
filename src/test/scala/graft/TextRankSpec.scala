package graft

import graft.operators.TextRank

/** TextRank keyword extraction: hub words outrank leaves, the length
  * filter drops function words, and ranking is partition-invariant. */
class TextRankSpec extends SparkSpec {

  import spark.implicits._

  test("a hub word co-occurring with many distinct words outranks leaves") {
    // 'engine' is adjacent to 6 distinct words; each leaf sees only it
    val docs = Seq(
      "engine alpha", "engine bravo", "engine carol",
      "engine delta", "engine echo", "engine fox")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = TextRank.keywords(docs, k = 10, iters = 3).collect()
    assert(rows.head.getString(0) == "engine",
      s"hub must rank first: ${rows.map(_.getString(0)).toSeq}")
    assert(rows.head.getLong(1) == 6, "hub degree = 6 distinct neighbors")
    val prs = rows.map(_.getDouble(2))
    assert(prs.head > prs.last)
  }

  test("short tokens are filtered out; self-adjacency never forms an edge") {
    val docs = Seq((1L, "of to ab real real word word"))
      .toDF("doc_id", "text")
    val words = TextRank.keywords(docs, k = 10, iters = 1)
      .collect().map(_.getString(0)).toSet
    assert(!words.exists(_.length < 3), s"short tokens leaked: $words")
    assert(words == Set("real", "word"),
      "only the adjacent long-token pair forms an edge")
  }

  test("ranking is partition-layout invariant") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val a = TextRank.keywords(docs, k = 20).collect().toSeq
    val b = TextRank.keywords(docs.repartition(7), k = 20).collect().toSeq
    assert(a == b)
  }
}
