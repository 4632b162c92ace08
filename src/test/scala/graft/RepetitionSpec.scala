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

  test("fusedSignals: repetition fractions match signals(); token entropy " +
    "is exact scale-12 Shannon; null/empty docs are dropped by the filter") {
    val fused = Repetition.fusedSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fused.keySet == Set(1L, 2L, 3L)) // null text filtered out
    val f1 = fused(1L)
    val idx = Repetition.fusedSignals(docs).columns.zipWithIndex.toMap
    assert(f1.getDouble(idx("top_tok_frac")) == 0.8)
    assert(f1.getDouble(idx("dup_bigram_frac")) == 0.5)
    assert(f1.getBoolean(idx("repetitive")))
    // doc 1 = "spam spam spam spam ham" (lowered): p = (4/5, 1/5)
    // H = ln(5) - (4*ln(4) + 1*ln(1))/5, quantized to 6 decimals
    val h = math.log(5) - 4 * math.log(4) / 5
    assert(math.abs(f1.getDouble(idx("entropy_nats")) - h) < 2e-6)
    // doc 3 single token: entropy 0, dup frac NULL
    val f3 = fused(3L)
    assert(f3.getDouble(idx("entropy_nats")) == 0.0)
    assert(f3.isNullAt(idx("dup_bigram_frac")))
    // every doc here fails the Gopher word-count bound (n < 50) -> !pass
    assert(fused.values.forall(!_.getBoolean(idx("pass"))))
  }
}
