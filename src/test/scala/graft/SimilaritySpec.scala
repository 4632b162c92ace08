package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Similarity
import graft.sources.Tables

/** ANN search: brute force is exact; LSH recalls most of the true top-k. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot: null array element -> null result, not silent zero") {
    val df = Seq(
      (Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f)))
      .toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b")).as("c"),
        VectorFns.dot(col("a"), col("b")).as("d"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("cosine: orthogonal -> 0, identical -> 1, zero vector -> null") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(0f, 0f), Array(1f, 1f)))
      .toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).contains(0.0))
    assert(got(1).exists(v => math.abs(v.asInstanceOf[Double] - 1.0) < 1e-12))
    assert(got(2).isEmpty)
  }

  test("brute-force top-k: k rows per query, ranks ordered by score") {
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val out = Similarity.bruteForceTopK(embs, queries, k = 4).collect()
    assert(out.length == 12)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }

  test("range search: subset of exact radius set, every score >= tau, " +
      "and exact on the pairs LSH surfaces") {
    val tau = 0.15
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val got = Similarity.rangeSearch(embs, queries, tau).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.nonEmpty, "fixture must yield at least one in-radius pair")
    assert(got.forall(_._2 >= tau))
    // exact radius set via the brute-force cross product
    val exact = embs.crossJoin(broadcast(queries))
      .withColumn("score", VectorFns.cosine(col("embedding"), col("q_embedding")))
      .filter(col("score") >= tau && col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "score").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // LSH prefilter can only LOSE pairs, never invent or mis-score them
    got.foreach { case (k, s) =>
      assert(exact.get(k).contains(s), s"pair $k not in exact radius set")
    }
  }

  test("IVF range search: subset of the exact radius set with exact " +
      "scores (cell probing can only lose pairs)") {
    val tau = 0.12
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val got = Similarity.ivfRangeSearch(embs, queries, tau).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= tau))
    val exact = embs.crossJoin(broadcast(queries))
      .withColumn("score", VectorFns.cosine(col("embedding"), col("q_embedding")))
      .filter(col("score") >= tau && col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "score").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (k, s) =>
      assert(exact.get(k).contains(s), s"pair $k not in exact radius set")
    }
  }

  test("LSH top-k: recall@5 >= 0.4 vs brute force on fixture embeddings") {
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Similarity.bruteForceTopK(embs, queries, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(embs, queries, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random near-orthogonal vectors are LSH's worst case; planted
    // near-dup recall is covered in DedupSpec
    assert(recall >= 0.4, s"recall@5 = $recall")
  }

  test("IVF top-k: k rows per query; cell-probe results are a subset of " +
    "brute-force scores") {
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val out = Similarity.ivfTopK(embs, queries, k = 3, codebookSize = 8)
      .collect()
    assert(out.groupBy(_.getLong(0)).forall(_._2.length == 3))
    // every returned (query, corpus) pair's score must equal the exact cosine
    val exact = Similarity.bruteForceTopK(embs, queries, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      assert(exact((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("IVF append == rebuild with the same codebook: probing the " +
    "subset-built index after appending the rest equals one full build " +
    "over everything with that codebook; appended files land in the " +
    "same cell layout") {
    val embs = Tables.embeddings(spark, sf0001)
    val prior = embs.filter(col("vec_id") % 3 =!= 0)
    val batch = embs.filter(col("vec_id") % 3 === 0)
    val queries = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val idxA = java.nio.file.Files.createTempDirectory("ivf-app").toString
    val cents = Similarity.writeIvfIndex(prior, idxA, codebookSize = 8)
    Similarity.appendIvfIndex(batch, cents, idxA)
    val appended = Similarity.ivfTopKIndexed(idxA, cents, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // rebuild: assign EVERYTHING against the SAME codebook in one shot
    val idxB = java.nio.file.Files.createTempDirectory("ivf-reb").toString
    Similarity.appendIvfIndex(embs, cents, idxB)
    val rebuilt = Similarity.ivfTopKIndexed(idxB, cents, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(appended == rebuilt && appended.nonEmpty)
    // layout: appended rows live under the same centroid_id partitions
    val cells = new java.io.File(idxA).listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).toSet
    assert(cells.nonEmpty)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val stored = spark.read.parquet(idxA).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(batchIds.subsetOf(stored))
  }

  test("IVF codebook is fixed-K: size independent of corpus row count") {
    // The round-1 design derived |centroids| = N/step, which made the
    // assignment O(N^2) and the broadcast unbounded. The sampled codebook
    // must stay at K rows no matter how the corpus grows.
    val small = spark.range(0, 100)
      .select(col("id").as("vec_id"),
        array(Seq.tabulate(4)(i => (col("id") * (i + 1)).cast("float")): _*)
          .as("embedding"))
    val large = spark.range(0, 10000)
      .select(col("id").as("vec_id"),
        array(Seq.tabulate(4)(i => (col("id") * (i + 1)).cast("float")): _*)
          .as("embedding"))
    assert(Similarity.sampledCodebook(small, 16).count() == 16)
    assert(Similarity.sampledCodebook(large, 16).count() == 16)
    // and the plan takes only K rows, it does not shuffle the corpus:
    // ORDER BY + LIMIT K executes as TakeOrderedAndProject
    val plan = Similarity.sampledCodebook(large, 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("brute-force top-k keeps colliding external query ids when " +
    "excludeSelfPairs=false") {
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    // external query whose id collides with corpus id 1 but is NOT row 1
    val queries = Seq((1L, Array(1f, 0f))).toDF("query_id", "q_embedding")
    val dropped = Similarity.bruteForceTopK(corpus, queries, k = 1)
      .collect()
    // default exclusion drops the legitimate best neighbor (vec 1)
    assert(dropped.map(_.getLong(1)).toSet == Set(2L))
    val kept = Similarity.bruteForceTopK(corpus, queries, k = 1,
      excludeSelfPairs = false).collect()
    assert(kept.map(_.getLong(1)).toSet == Set(1L))
  }

  test("hardNegativeTriplets: hand-checked positive/negative per query, " +
    "margin = pos - neg, lone-label query keeps a null positive") {
    // label 0: ids 1,2 near the x-axis; label 1: id 3 near y; label 2:
    // id 4 alone between them
    val corpus = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0f, 1f), 1), (4L, Array(0.7f, 0.7f), 2))
      .toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id").isin(1L, 4L))
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("label").as("q_label"))
    val rows = Similarity.hardNegativeTriplets(corpus, queries)
      .orderBy(col("query_id")).collect()
    val q1 = rows(0)
    assert(q1.getLong(0) == 1L)
    assert(q1.getLong(1) == 2L, "positive = the other label-0 vector")
    assert(q1.getLong(3) == 4L,
      "hard negative = nearest different-label (diagonal beats y-axis)")
    assert(q1.getDouble(5) == q1.getDouble(2) - q1.getDouble(4))
    assert(q1.getDouble(5) > 0, "positive should outscore the negative here")
    val q4 = rows(1)
    assert(q4.getLong(0) == 4L)
    assert(q4.isNullAt(1) && q4.isNullAt(2) && q4.isNullAt(5),
      "lone-label query: null positive and margin, never dropped")
    assert(!q4.isNullAt(3), "but its hard negative exists")
  }

  test("matryoshka recall: the full-dimension tier is its own truth " +
    "(recall 1.0), truncated tiers stay in [0,1] with exact hit counts") {
    val rows = SparkEntry.queries("embed_matryoshka_recall")(spark, sf0001)
      .collect()
    assert(rows.length == 30) // 3 tiers x 10 queries
    rows.foreach { r =>
      val (d, hits, rec) = (r.getAs[Long]("dims"), r.getAs[Long]("n_hits"),
        r.getAs[Double]("recall_at_5"))
      assert(rec == hits.toDouble / 5.0 && hits >= 0 && hits <= 5)
      if (d == 64L) assert(rec == 1.0, s"full-dim tier must match truth: $r")
    }
  }
}
