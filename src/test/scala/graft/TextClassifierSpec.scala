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

  test("buckets must be a power of two") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextClassifier.hashedLinearScore(docs, buckets = 1000)
    }
  }
}
