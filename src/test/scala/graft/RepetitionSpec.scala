package graft

import graft.operators.Repetition

/** Gopher-style repetition signals: hand-computed fractions on tiny docs,
  * NULL propagation for degenerate inputs. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spam spam spam spam ham"),        // top 'spam' 4/5; bigrams: 4 total, 2 distinct
    (2L, "all tokens here are unique now"), // top 1/6, no dup bigrams
    (3L, "x"),                              // 1 token: no bigrams -> NULL dup frac
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private lazy val rows =
    Repetition.signals(docs).collect().map(r => r.getLong(0) -> r).toMap

  test("top-token and duplicate-bigram fractions are exact") {
    val r1 = rows(1L)
    assert(r1.getDouble(2) == 0.8) // 4/5
    // bigrams: spam-spam x3 + spam-ham -> total 4, distinct 2 -> dup 2/4
    assert(r1.getDouble(3) == 0.5)
    assert(r1.getBoolean(5)) // repetitive
    val r2 = rows(2L)
    assert(r2.getDouble(2) == 1.0 / 6 && r2.getDouble(3) == 0.0)
    assert(!r2.getBoolean(5))
  }

  test("single-token doc: NULL dup_bigram_frac, repetitive still true via top fraction") {
    val r3 = rows(3L)
    assert(r3.isNullAt(3))
    assert(r3.getDouble(2) == 1.0 && r3.getBoolean(5))
  }

  test("NULL text propagates NULL signals") {
    val r4 = rows(4L)
    assert(r4.isNullAt(1) && r4.isNullAt(2) && r4.isNullAt(3) && r4.isNullAt(4) && r4.isNullAt(5))
  }
}
