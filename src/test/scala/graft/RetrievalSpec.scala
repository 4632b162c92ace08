package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 retrieval: scoring semantics on a hand-computable corpus plus
  * plan-shape assertions (no corpus-wide explode; broadcast stats). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark join"),       // tf(spark)=3, dl=4
    (2L, "spark join join"),              // tf(spark)=1, dl=3
    (3L, "window scan filter agg scan"),  // tf(spark)=0, dl=5
    (4L, "spark"),                        // tf(spark)=1, dl=1
    (5L, null.asInstanceOf[String]),      // dropped
    (6L, "   ")                           // blank: dropped
  ).toDF("doc_id", "text")

  test("single-term scores: higher tf wins, shorter doc wins at equal tf") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .collect()
    val order = got.map(_.getLong(0)).toSeq
    // doc 1 (tf=3) first; docs 2 vs 4 both tf=1 but 4 is shorter; doc 3
    // scores 0; null/blank docs never appear
    assert(order == Seq(1L, 4L, 2L, 3L), s"got $order")
    val scores = got.map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert(scores(4L) > scores(2L) && scores(2L) > scores(3L))
    assert(scores(3L) == 0.0)
    // hand-check doc 4: N=4, df=3, idf=ln(1+1.5/3.5); tf=1, dl=1,
    // avgdl=13/4
    val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    val expected = idf * 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 1.0 / 3.25))
    assert(math.abs(scores(4L) - expected) < 5e-7, s"${scores(4L)} vs $expected")
  }

  test("multi-term score is the sum of per-term scores") {
    val one = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .select(col("doc_id"), col("score_r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("join"), k = 10)
      .select(col("doc_id"), col("score_r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "join"), k = 10)
      .select(col("doc_id"), col("score_r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    both.foreach { case (id, s) =>
      assert(math.abs(s - (one(id) + two(id))) < 2e-6, s"doc $id")
    }
  }

  test("plan: no Explode/Expand over the corpus, stats side broadcast") {
    val df = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "join"), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Explode") && !plan.contains("Expand"),
      s"corpus token explode leaked into the plan:\n$plan")
    assert(plan.contains("Broadcast"), s"stats row not broadcast:\n$plan")
  }

  test("collocations: tight pair tops PMI, support floor filters hapax " +
    "pairs, counts exact, layout-invariant") {
    // "new york" always co-occurs (tight collocation); "is" is promiscuous
    val docs = Seq(
      (1L, "new york is big"),
      (2L, "new york is old"),
      (3L, "the cat is here"),
      (4L, "the dog is here"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Retrieval.collocationsTopK(docs, "doc_id", "text",
      minCount = 2, k = 10).collect()
    // pairs with support >= 2: (new,york) 2, (york,is) 2, (the,?) no —
    // (is,here) 2
    val byPair = got.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.forall(_.getLong(2) >= 2), "support floor")
    assert(byPair.contains(("new", "york")) && byPair.contains(("york", "is"))
      && byPair.contains(("is", "here")), s"pairs: ${byPair.keySet}")
    // 12 bigram occurrences total; pmi(new,york) = ln(2*12/(2*2))
    val (cp, c1, c2, pmi) = byPair(("new", "york"))
    assert((cp, c1, c2) == (2L, 2L, 2L))
    assert(math.abs(pmi - math.log(2.0 * 12 / 4)) < 1e-6)
    // the exclusive pair must outrank both promiscuous-"is" pairs
    assert(got.head.getString(0) == "new" && got.head.getString(1) == "york")
    val again = Retrieval.collocationsTopK(docs.repartition(7), "doc_id",
      "text", minCount = 2, k = 10).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("k bounds the output and ties break by doc_id") {
    val dup = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(dup, "doc_id", "text", Seq("alpha"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 11L))
  }

  test("rrfFuse: hand-checked fusion — both-list items beat single-list, " +
    "single-list items keep their one contribution, ties break by id") {
    val imp = spark.implicits; import imp._
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "lex_rank")
    val sem = Seq((2L, 1), (4L, 2)).toDF("doc_id", "sem_rank")
    val rows = graft.operators.Retrieval
      .rrfFuse(lex, sem, "doc_id", "lex_rank", "sem_rank", k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(rows(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15,
      "doc 2 sums both lists' contributions")
    assert(rows(2L) > rows(1L), "two mid ranks beat one top rank here")
    assert(rows(1L) == 1.0 / 61 && rows(4L) == 1.0 / 62 &&
      rows(3L) == 1.0 / 63)
  }

  test("rag_chunk_topk: provenance round-trips, ranking is by rounded " +
    "score with chunk_id tie-break, and scored chunks contain a term") {
    val rows = SparkEntry.queries("rag_chunk_topk")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (cid, did, cidx) = (r.getAs[Long]("chunk_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"))
      assert(cid == did * 1000000L + cidx)
      // a top-k chunk must actually hit at least one query term
      assert(r.getAs[Int]("tf_vector") + r.getAs[Int]("tf_join") +
        r.getAs[Int]("tf_stream") > 0)
    }
    val scores = rows.map(r =>
      (r.getAs[Double]("score_r"), r.getAs[Long]("chunk_id")))
    scores.sliding(2).foreach {
      case Array((s1, c1), (s2, c2)) =>
        assert(s1 > s2 || (s1 == s2 && c1 < c2), "output order broken")
      case _ =>
    }
  }
}
