package graft

import org.apache.spark.sql.functions._

import graft.operators.TextClassifier
import graft.sources.Tables

/** Hashed linear classifier: determinism, score bounds, token accounting. */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("scores are in (0,1), token counts exact, blank docs absent") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha"),
      (3L, "   "),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextClassifier.hashedLinearScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 3 && got(2L)._1 == 2)
    got.values.foreach { case (_, s) => assert(s > 0 && s < 1) }
  }

  test("same tokens -> same score regardless of duplication count ratio " +
    "(mean pooling): a doc of one repeated token scores sigmoid(w/1000)") {
    val docs = Seq((1L, "tok"), (2L, "tok tok tok tok")).toDF("doc_id", "text")
    val got = TextClassifier.hashedLinearScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == got(2L), "mean pooling must ignore repetition count")
  }

  test("deterministic across partitionings and re-runs") {
    val docs = Tables.documents(spark, sf0001)
    def run(parts: Int) = TextClassifier
      .hashedLinearScore(docs.repartition(parts))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val a = run(1); val b = run(13)
    assert(a.nonEmpty && a == b)
  }

  test("train: class-separating tokens get signed weights in the right " +
      "direction, and training is partition-layout invariant") {
    val docs = Seq(
      (1L, "good good stuff", "en"),
      (2L, "good content", "en"),
      (3L, "bad junk", "de"),
      (4L, "bad bad noise", "de")
    ).toDF("doc_id", "text", "lang")
    def bucketOf(tok: String): Long = {
      val h = graft.functions.HashExprs.fnv1a64(
        s"qb|$tok".getBytes("UTF-8"))
      ((h % 4096L) + 4096L) % 4096L
    }
    val w = TextClassifier.train(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // "good" appears only in y=1 docs -> err = p - 1 < 0 -> weight rises;
    // "bad" only in y=0 docs -> weight falls
    assert(w(bucketOf("good")) > 0,
      s"'good' must earn a positive weight: $w")
    assert(w(bucketOf("bad")) < 0,
      s"'bad' must earn a negative weight: $w")
    val again = TextClassifier.train(docs.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == again, "training must be partition-order invariant")
  }

  test("train: more rounds move separating weights further from zero " +
      "(full-batch GD on a separable corpus keeps descending)") {
    val docs = Seq(
      (1L, "good", "en"), (2L, "good", "en"), (3L, "bad", "de")
    ).toDF("doc_id", "text", "lang")
    def weightAfter(r: Int): Double = {
      val h = graft.functions.HashExprs.fnv1a64("qb|good".getBytes("UTF-8"))
      val b = ((h % 4096L) + 4096L) % 4096L
      TextClassifier.train(docs, rounds = r).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap.apply(b)
    }
    val w1 = weightAfter(1)
    val w3 = weightAfter(3)
    assert(w1 > 0 && w3 > w1, s"descent must continue: w1=$w1 w3=$w3")
  }

  test("trainedScore separates the classes it trained on: every positive " +
      "doc outscores every negative doc on a separable corpus") {
    val docs = Seq(
      (1L, "good good stuff", "en"),
      (2L, "good content", "en"),
      (3L, "bad junk", "de"),
      (4L, "bad bad noise", "de")
    ).toDF("doc_id", "text", "lang")
    val scores = TextClassifier.trainedScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = Seq(1L, 2L).map(scores)
    val neg = Seq(3L, 4L).map(scores)
    assert(pos.min > neg.max,
      s"positives must outscore negatives: $scores")
    scores.values.foreach(s => assert(s > 0 && s < 1))
  }

  test("serving is label-free and total: unlabeled docs score, and a " +
      "pure-OOV doc gets the neutral 0.5 — never silently dropped") {
    val trainDocs = Seq(
      (1L, "good good stuff", "en"),
      (2L, "good content", "en"),
      (3L, "bad junk", "de"),
      (4L, "bad bad noise", "de")
    ).toDF("doc_id", "text", "lang")
    val weights = TextClassifier.trainWeightValues(trainDocs)
    // serving corpus: no lang column at all, one doc fully OOV
    val serveDocs = Seq(
      (10L, "good stuff"),
      (11L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val scores = TextClassifier.scoreWith(serveDocs, weights.toSeq).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(10L, 11L))
    assert(scores(10L) > 0.5, s"positive-token doc must score > 0.5: $scores")
    assert(scores(11L) == 0.5, s"pure-OOV doc must score exactly 0.5: $scores")
  }

  test("training ignores label-null docs but serving still scores them") {
    val docs = Seq(
      (1L, "good stuff", "en"),
      (2L, "bad junk", "de"),
      (3L, "good mystery", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "lang")
    val scored = TextClassifier.trainedScore(docs).collect()
      .map(r => r.getLong(0)).toSet
    assert(scored == Set(1L, 2L, 3L),
      s"unlabeled doc 3 must still be scored: $scored")
  }

  test("buckets must be a power of two") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextClassifier.hashedLinearScore(docs, buckets = 1000)
    }
  }
}
