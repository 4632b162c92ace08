package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}
import graft.sources.Tables

/** Product quantization: geometry, code semantics, ADC consistency. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def embs = Tables.embeddings(spark, sf0001).limit(300)

  test("train: one codebook per subspace, centroids have subspace dims") {
    val books = Pq.train(embs, m = 4, k = 4, iters = 2).collect()
    val bySub = books.groupBy(_.getInt(0))
    assert(bySub.keySet == Set(0, 1, 2, 3))
    bySub.values.foreach { cs =>
      assert(cs.length <= 4 && cs.nonEmpty)
      cs.foreach(r => assert(r.getSeq[Double](2).length == 16))
    }
  }

  test("encode: m codes per vector, each from that subspace's codebook") {
    val books = Pq.train(embs, m = 4, k = 4, iters = 1)
    val codes = Pq.encode(embs, books, m = 4)
    val n = embs.filter(col("embedding").isNotNull).count()
    assert(codes.count() == n * 4)
    val valid = books.select(col("subspace"), col("centroid_id").as("code"))
      .withColumn("ok", lit(true))
    val bad = codes.join(valid, Seq("subspace", "code"), "left_anti").count()
    assert(bad == 0, s"$bad codes outside their subspace codebook")
  }

  test("encode argmin: a vector equal to an untrained (iters-free) seed " +
    "encodes to that seed's id in every subspace") {
    // build codebooks WITHOUT refinement so seeds are exact centroids
    val d = 16
    val clean = embs.filter(col("embedding").isNotNull)
    val seedIds = Similarity.sampledCodebook(clean, 4).select("centroid_id")
      .collect().map(_.getLong(0)).toSet
    val books = (0 until 4).map { s =>
      Similarity.sampledCodebook(
        clean.select(col("vec_id"),
          slice(col("embedding"), s * d + 1, d).as("embedding")), 4)
        .select(lit(s).as("subspace"), col("centroid_id"),
          col("c_vec"))
    }.reduce(_ unionByName _)
    val seedVecs = clean.filter(col("vec_id").isin(seedIds.toSeq: _*))
    val codes = Pq.encode(seedVecs, books, m = 4).collect()
    codes.foreach { r =>
      assert(r.getLong(2) == r.getLong(0),
        s"seed ${r.getLong(0)} subspace ${r.getInt(1)} coded ${r.getLong(2)}")
    }
  }

  test("adcTopK: the query's own vector ranks first with distance equal to " +
    "its reconstruction error sum; k bounds output") {
    val books = Pq.train(embs, m = 4, k = 8, iters = 1)
    val codes = Pq.encode(embs, books, m = 4)
    val qid = 3L
    val qvec = embs.filter(col("vec_id") === qid)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toSeq
    val top = Pq.adcTopK(codes, books, qvec, m = 4, k = 10).collect()
    assert(top.length == 10)
    // ADC distance of the query's own row = sum of its per-subspace
    // quantization errors — no other vector sharing its codes can beat it
    // (same codes => same ADC distance), so it must appear at rank <= ties
    val qDist = top.find(_.getLong(0) == qid)
    assert(qDist.isDefined, "query vector missing from its own top-10")
    assert(top.head.getDouble(1) <= qDist.get.getDouble(1) + 1e-9)
    // distances are non-decreasing
    val ds = top.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted)
  }

  test("plan: codebooks and ADC lookup table are broadcast") {
    val books = Pq.train(embs, m = 4, k = 4, iters = 1)
    val codes = Pq.encode(embs, books, m = 4)
    assert(codes.queryExecution.executedPlan.toString.contains("Broadcast"))
    val qvec = Seq.fill(64)(0.1)
    val adc = Pq.adcTopK(codes, books, qvec, m = 4, k = 5)
    assert(adc.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("ivfPqTopK: probing ALL cells equals the full-corpus ADC ranking " +
    "(cell pruning is the only approximation added over PQ)") {
    val queries = embs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val got = Pq.ivfPqTopK(embs, queries, k = 5, ivfK = 4, nProbe = 4)
      .collect().groupBy(_.getLong(0))
    // same training subsample as ivfPqTopK's default (quantizer equality is
    // required for ADC distances to match exactly)
    val trainSet = Pq.trainSample(
      embs.filter(col("embedding").isNotNull), "vec_id", 3L)
    val books = Pq.train(trainSet, m = 4, k = 8, iters = 1)
    val codes = Pq.encode(embs, books, m = 4)
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val qvec = qr.getSeq[Float](1).map(_.toDouble).toSeq
      val expected = Pq.adcTopK(codes, books, qvec, m = 4, k = 6)
        .collect().filter(_.getLong(0) != qid).take(5)
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val actual = got(qid).sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(actual == expected, s"query $qid: $actual != $expected")
    }
  }

  test("ivfPqTopK: ranks are 1..k per query, distances non-decreasing, " +
    "no self pairs") {
    val queries = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val rows = Pq.ivfPqTopK(embs, queries, k = 5).collect()
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val ds = sorted.map(_.getDouble(2)).toSeq
      assert(ds == ds.sorted, s"query $qid distances not sorted")
      assert(!rs.exists(_.getLong(1) == qid), s"query $qid self pair")
    }
  }

  test("writeIvfPqIndex + ivfPqTopKIndexed is result-identical to the " +
    "in-memory ivfPqTopK with the same training parameters") {
    val queries = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Pq.writeIvfPqIndex(embs, idx, iters = 2, ivfIters = 2)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3)) // (query_id, rank)
    val got = Pq.ivfPqTopKIndexed(idx, queries, k = 5)
      .collect().map(r => key(r) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Pq.ivfPqTopK(embs, queries, k = 5, iters = 2, ivfIters = 2)
      .collect().map(r => key(r) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
    // the serving read must be partition-pruned to the probed cells
    val planned = Pq.ivfPqTopKIndexed(idx, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(planned.contains("PartitionFilters"), "index scan must prune cells")
  }

  test("geometry validation fails fast") {
    intercept[IllegalArgumentException] {
      Pq.train(embs, m = 5, k = 4, iters = 1) // 5 does not divide 64
    }
    intercept[IllegalArgumentException] {
      Pq.adcTopK(embs, embs, Seq(1.0), m = 4, k = 5) // query dim wrong
    }
  }
}
