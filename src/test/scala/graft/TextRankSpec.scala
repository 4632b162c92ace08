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

  test("rake: hand-checked deg/freq milli scores on one document") {
    import spark.implicits._
    // candidates: [deep learning models], [deep learning], [neural networks]
    // freq: deep 2, learning 2, models 1, neural 1, networks 1
    // deg:  deep 5, learning 5, models 3, neural 2, networks 2
    // wscore millis: 2500, 2500, 3000, 2000, 2000
    val docs = Seq((1L,
      "deep learning models of deep learning and neural networks"))
      .toDF("doc_id", "text")
    val got = TextRank.rake(docs, stop = Seq("of", "and"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("deep learning models", 1L, 8000L),
      ("deep learning", 1L, 5000L),
      ("neural networks", 1L, 4000L)))
  }

  test("rake: no stopword inside any phrase; repeated phrases counted once " +
    "with occurrence tally; layout invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector joins and vector joins for the stream engine"),
      (2L, "vector joins in a stream engine")).toDF("doc_id", "text")
    val stop = graft.functions.TextFns.stopwords("en")
    val rows = TextRank.rake(docs, stop)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.forall { case (p, _) =>
      p.split(" ").forall(t => !stop.contains(t)) })
    assert(rows.toMap.apply("vector joins") == 3L)
    val re = TextRank.rake(docs.repartition(5), stop)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == re.toSeq)
  }
}
