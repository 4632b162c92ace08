package graft

import graft.functions.Bpe

/** BPE merge TRAINING semantics ([[Bpe.trainMerges]]): pair counting over
  * the word-frequency dictionary, deterministic argmax tie-break, and
  * later ranks consuming earlier ranks' products. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-computed merges of a tiny corpus, in rank order") {
    // vocab: "ab" x2 (one doc contributes it twice), "abc" x1
    // round 1 pairs: (a,b) = 2+1 = 3, (b,c) = 1 -> merge (a,b), count 3
    // round 2: "ab" -> [ab]; "abc" -> [ab, c] -> (ab,c) = 1
    val docs = Seq("ab ab", "abc").toDF("text")
    val learned = Bpe.trainMerges(docs, rounds = 2)
    assert(learned == Seq(("a", "b", 3L), ("ab", "c", 1L)))
  }

  test("argmax ties break on (lhs, rhs) ascending") {
    // (x,y) and (y,z) both count 1 -> lexicographically smaller lhs wins
    val docs = Seq("xy", "yz").toDF("text")
    assert(Bpe.trainMerges(docs, rounds = 1) == Seq(("x", "y", 1L)))
  }

  test("counts weight by word FREQUENCY, not distinct words") {
    // "zq" appears 3x as a word; (p,r) appears in 2 distinct words once
    // each -> (z,q)=3 beats (p,r)=2
    val docs = Seq("zq zq", "zq", "pr", "pra").toDF("text")
    val first = Bpe.trainMerges(docs, rounds = 1).head
    assert(first == (("z", "q", 3L)))
  }

  test("normalization matches application: case folded, whitespace collapsed") {
    // "AB" and "ab" are the same word after lower(); tab/newline collapse
    val docs = Seq("AB\tab", "ab\n").toDF("text")
    assert(Bpe.trainMerges(docs, rounds = 1) == Seq(("a", "b", 3L)))
  }

  test("exhausted corpus fails loudly instead of returning short") {
    // single-char words only: no adjacent pairs exist at round 1
    val docs = Seq("a b", "c").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMerges(docs, rounds = 1)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("learned merges drive the counter consistently (apply side)") {
    // training on this corpus yields [(a,b), (ab,c)]; applying the LEARNED
    // table through the native counter must collapse "abc" to one token —
    // the train->apply contract pack_sequences-style consumers rely on
    import org.apache.spark.sql.functions.col
    val docs = Seq("ab ab", "abc").toDF("text")
    val learned = Bpe.trainMerges(docs, rounds = 2).map { case (a, b, _) => (a, b) }
    val counts = Seq("abc", "ab ab", "zz").toDF("text")
      .select(Bpe.tokenCountWith(col("text"), learned))
      .collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(1L, 2L, 2L))
  }

  test("tokenCountWith under the FIXED table == tokenCount (same chain)") {
    import org.apache.spark.sql.functions.col
    val docs = Seq("the cat and the hat", "in the beginning", "  ")
      .toDF("text")
    val both = docs.select(
      Bpe.tokenCount(col("text")).as("a"),
      Bpe.tokenCountWith(col("text"), Bpe.merges).as("b")).collect()
    both.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }
}
