package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** Bigram-LM NLL scoring: hand-computable model, OOV mapping, and the
  * quality-ordering property the filter exists for. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed model: repeated transition scores lower NLL than a " +
    "one-off; single-token and blank docs are absent") {
    val docs = Seq(
      (1L, "a b a b a b"),   // a->b x3, b->a x2
      (2L, "a c"),           // a->c once
      (3L, "a"),             // no bigrams
      (4L, "  ")             // blank
    ).toDF("doc_id", "text")
    val got = LangModel.bigramNll(docs, topVocab = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L), s"got ${got.keySet}")
    assert(got(1L)._1 == 5 && got(2L)._1 == 1)
    // doc 1's transitions are the model's bulk; doc 2's a->c is rare
    assert(got(1L)._2 < got(2L)._2,
      s"frequent transitions must score lower NLL: $got")
    // exact check for doc 2: corpus bigrams: a->b:3, b->a:2, a->c:1.
    // cu(a)=4, k=0.5, V=17: p(c|a) = (1+0.5)/(4+8.5)
    val expected = -math.log(1.5 / 12.5)
    assert(math.abs(got(2L)._2 - expected) < 2e-6, s"${got(2L)._2} vs $expected")
  }

  test("topVocab cap maps tail tokens to <unk>, bounding the model") {
    // 3 frequent tokens + a long tail; vocab of 3 forces the tail to share
    // the <unk> class, so tail-heavy docs still score (no model blowup)
    val docs = Seq(
      (1L, "x y z x y z x y z"),
      (2L, "q1 q2 q3 q4 q5 q6 q7 q8")
    ).toDF("doc_id", "text")
    val got = LangModel.bigramNll(docs, topVocab = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.contains(1L) && got.contains(2L))
    // doc 2 is pure <unk>-><unk>: transitions all collapse to one cell,
    // making it LOOK frequent — the documented vocab-cap tradeoff; the
    // in-vocab doc must still be the better-scoring one here since its
    // transitions are equally concentrated AND in-vocab
    assert(got(1L) < got(2L) + 1.0)
  }

  test("scores are invariant to input partitioning") {
    val docs = sources.Tables.documents(spark, sf0001).limit(200)
    val a = LangModel.bigramNll(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LangModel.bigramNll(docs.repartition(13)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b, "NLL depends on partitioning")
  }

  test("tokenKlDivergence: identical slices score 0, diverged slices " +
    "score positive in both directions") {
    val docs = sources.Tables.documents(spark, sf0001)
    val same = LangModel.tokenKlDivergence(docs, docs).collect().head
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0,
      s"KL(P||P) must be 0: $same")
    val a = docs.filter($"doc_id" % 2 === 0)
    // force divergence: side B's text gets a token A never has
    val b = docs.filter($"doc_id" % 2 === 1)
      .withColumn("text", concat($"text", lit(" zzdivergentzz")))
    val row = LangModel.tokenKlDivergence(a, b).collect().head
    assert(row.getDouble(3) > 0 && row.getDouble(4) > 0, s"got $row")
    // n_vocab covers the union; totals count each side's tokens
    assert(row.getLong(0) > 0 && row.getLong(1) > 0 && row.getLong(2) > 0)
  }

  test("tokenKlDivergence is invariant to input partitioning") {
    val docs = sources.Tables.documents(spark, sf0001)
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val x = LangModel.tokenKlDivergence(a, b).collect().head.toSeq
    val y = LangModel.tokenKlDivergence(
      a.repartition(13), b.repartition(7)).collect().head.toSeq
    assert(x == y)
  }

  test("zipfFit: hand-built frequency curve gives the expected integer " +
    "log moments and a negative slope") {
    // corpus: 'a' x4, 'b' x2, 'c' x1 -> ranks 1,2,3 with freqs 4,2,1.
    // scale-6 logs: x = (0, 693147, 1098612), y = (1386294, 693147, 0)
    // (FixedLog's atanh series is ~1e-12 accurate, so each scale-6 floor
    // can sit 1 off the true value at worst)
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "a"))
      .toDF("doc_id", "text")
    val r = LangModel.zipfFit(docs).collect().head
    assert(r.getAs[Long]("n") == 3)
    assert(math.abs(r.getAs[Long]("sx") - (0L + 693147L + 1098612L)) <= 3)
    assert(math.abs(r.getAs[Long]("sy") - (1386294L + 693147L + 0L)) <= 3)
    val slope = r.getAs[Double]("slope")
    assert(slope < -1.0 && slope > -1.5, s"slope $slope")
    // exact OLS on (x, y) = (ln rank, ln freq): slope -1.2337,
    // intercept ybar - slope*xbar = 1.42997 nats
    assert(math.abs(r.getAs[Double]("intercept") - 1.42997) < 0.001)
    // num/den are the exact integer OLS numerator/denominator
    val (n, sx, sy, sxy, sxx) = (r.getAs[Long]("n"), r.getAs[Long]("sx"),
      r.getAs[Long]("sy"), r.getAs[Long]("sxy"), r.getAs[Long]("sxx"))
    assert(r.getAs[Long]("num") == n * sxy - sx * sy)
    assert(r.getAs[Long]("den") == n * sxx - sx * sx)
    assert(slope == r.getAs[Long]("num").toDouble / r.getAs[Long]("den").toDouble)
  }

  test("zipfFit: topK caps the fitted rows; layout invariance") {
    val many = (1 to 40).flatMap(i =>
      Seq.fill(41 - i)((i.toLong, s"tok$i"))).toDF("doc_id", "text")
    val r = LangModel.zipfFit(many, topK = 10).collect().head
    assert(r.getAs[Long]("n") == 10)
    val r2 = LangModel.zipfFit(many.repartition(7), topK = 10).collect().head
    assert(r.toSeq == r2.toSeq)
  }

  test("zipfFit property: slope is never positive (rank order is by " +
    "freq desc, so ln freq is non-increasing in ln rank) and n <= topK") {
    val rnd = new scala.util.Random(19)
    (1 to 3).foreach { trial =>
      val docs = Seq.tabulate(120)(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(12))(
          "w" + rnd.nextInt(30)).mkString(" ")))
        .toDF("doc_id", "text")
      val r = LangModel.zipfFit(docs, topK = 16).collect().head
      assert(r.getAs[Long]("n") <= 16, s"trial $trial")
      assert(r.getAs[Double]("slope") <= 0.0,
        s"trial $trial slope ${r.getAs[Double]("slope")}")
    }
  }
}
