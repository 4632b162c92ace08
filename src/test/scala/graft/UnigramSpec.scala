package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM tokenizer hard-EM step: Viterbi DP semantics and the
  * end-to-end estimation step on hand-computable corpora. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbiSeg: max-likelihood split wins; exact score ties keep the " +
    "smallest last token; unknown characters yield null") {
    val df = Seq("aa", "ab").toDF("w")
    // hand-built micro-nat table: "aa" path and "a|a" path tie exactly
    // (-2_000_000 each) -> smallest last-token length must win
    val tie = df.select(col("w"),
      Unigram.viterbiSeg(col("w"), Seq("a", "aa"),
        Seq(-1000000L, -2000000L)).as("toks"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[String](1))).toMap
    assert(tie("aa").contains(Seq("a", "a")),
      s"tie must keep the smallest split: $tie")
    assert(tie("ab").isEmpty, "unknown char 'b' must yield null")
    // now make the whole-word token strictly cheaper -> it must win
    val whole = df.select(
      Unigram.viterbiSeg(col("w"), Seq("a", "aa", "ab"),
        Seq(-3000000L, -2000000L, -1000000L)).as("toks"))
      .collect().map(r => Option(r.getSeq[String](0)))
    assert(whole(0).contains(Seq("aa")) && whole(1).contains(Seq("ab")))
  }

  test("emStep segments along the dominant subwords (hand-computed seed " +
    "model), resolves the exact abab|ab vs ab|abab score tie by smallest " +
    "last token, and is partition-layout invariant") {
    // seed counts (weighted by word occurrences): lp(ab) = ln(13/74),
    // lp(abab) = ln(8/74). 'abab' -> whole token beats ab|ab; 'ababab' ->
    // {abab,ab} in either order scores identically (same multiset), an
    // EXACT decimal tie the DP must break toward the smaller last token
    val docs = Seq((1L, "ababab ababab abab"), (2L, "ababab abab"))
      .toDF("doc_id", "text")
    val got = Unigram.emStep(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3x 'ababab' -> (abab, ab); 2x 'abab' -> (abab)
    assert(got == Map("abab" -> 5L, "ab" -> 3L),
      s"expected {abab:5, ab:3}: $got")
    val again = Unigram.emStep(docs.repartition(5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("emTrain: one round == emStep exactly; two rounds reach the " +
    "fixpoint on the abab corpus (hard EM is stable once mass " +
    "concentrates) and stay partition-invariant") {
    val docs = Seq((1L, "ababab ababab abab"), (2L, "ababab abab"))
      .toDF("doc_id", "text")
    val one = Unigram.emTrain(docs, rounds = 1).collect().map(_.toSeq).toSeq
    val step = Unigram.emStep(docs).collect().map(_.toSeq).toSeq
    assert(one == step)
    val two = Unigram.emTrain(docs, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round-2 model = {abab:5, ab:3} + char floor (a:1, b:1); the floored
    // probs still rank abab/ab far above the chars, so segmentation is
    // unchanged — the EM fixpoint
    assert(two == Map("abab" -> 5L, "ab" -> 3L), s"fixpoint: $two")
    val again = Unigram.emTrain(docs.repartition(4), rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two == again)
  }

  test("tokenCounts: per-doc counts reconcile with the training pass's " +
    "total token mass, and hand-check on the abab corpus") {
    val docs = Seq((1L, "ababab ababab abab"), (2L, "ababab abab"))
      .toDF("doc_id", "text")
    // final model {abab, ab, a, b}: 'ababab' -> 2 toks, 'abab' -> 1 tok
    val got = Unigram.tokenCounts(docs, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 3L), s"per-doc counts: $got")
    // invariant vs emTrain: sum over docs == sum of per-token n
    val trainMass = Unigram.emTrain(docs, rounds = 2)
      .agg(sum("n")).collect().head.getLong(0)
    assert(got.values.sum == trainMass)
  }

  test("emStep output is a normalized log distribution over surviving " +
    "tokens (sum of exp(logp) ~ 1) on a mixed corpus") {
    val docs = Seq((1L, "the cat sat"), (2L, "the mat"), (3L, "the cat"))
      .toDF("doc_id", "text")
    val rows = Unigram.emStep(docs).collect()
    val mass = rows.map(r => math.exp(r.getDouble(2)) * 1.0).sum
    // each token's prob = n/ntot, so total mass is 1 up to 6-decimal logp
    // rounding
    assert(math.abs(mass - 1.0) < 1e-3, s"mass $mass")
    val n = rows.map(_.getLong(1)).sum
    val perTok = rows.map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perTok.getOrElse("the", 0L) >= 3L,
      s"'the' occurs 3x and must survive whole or as dominant parts: $perTok")
    assert(n > 0)
  }
}
