package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE application semantics: merge order, left-to-right greediness,
  * word-boundary isolation, count consistency. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(s: String): Seq[String] =
    Seq(s).toDF("text").select(Bpe.tokens(col("text"))).head.getSeq[String](0)

  private def countOf(s: String): Long =
    Seq(s).toDF("text").select(Bpe.tokenCount(col("text"))).head.getLong(0)

  test("chained merges compose in rank order: the -> one token") {
    // (t,h) then (th,e): three chars collapse to one symbol
    assert(toksOf("the") == Seq("the"))
    // theory: th+e -> the, then (o,r) -> [the, or, y]
    assert(toksOf("theory") == Seq("the", "or", "y"))
  }

  test("merges never cross word boundaries") {
    // "t he": (t,h) must not merge across the space ((h,e) is not in the
    // table, so the second word stays two single-char symbols)
    assert(toksOf("t he") == Seq("t", "h", "e"))
    assert(countOf("t he") == 3L)
  }

  test("left-to-right non-overlapping within one rank") {
    // 'ananan' under (a,n): pairs merge greedily left to right -> an an an;
    // then (an,d) finds no d
    assert(toksOf("ananan") == Seq("an", "an", "an"))
  }

  test("count equals token-array length; unmergeable chars stay single") {
    val s = "zq the and testing"
    assert(countOf(s) == toksOf(s).length.toLong)
    assert(toksOf("zq") == Seq("z", "q"))
  }

  test("whitespace collapse and case folding match the oracle contract") {
    assert(countOf("  The\t\tTHEORY  ") == countOf("the theory"))
  }

  test("empty and null") {
    assert(countOf("") == 0L)
    val n = Seq[Option[String]](None).toDF("text")
      .select(Bpe.tokenCount(col("text"))).head
    assert(n.isNullAt(0))
  }

  test("native expression equals the built-in replace chain on the fixture " +
    "(the chain is what the oracle restates)") {
    val docs = sources.Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull).limit(300)
    val diff = docs.select(
        Bpe.tokenCount(col("text")).as("nat"),
        Bpe.tokenCountBuiltin(col("text")).as("ref"))
      .filter(col("nat") =!= col("ref")).count()
    assert(diff == 0L)
    // and on adversarial strings: delimiter chars, repeated whitespace
    val weird = Seq("the ⟨the⟩ and", "a  \t b", "", "ing ing inging")
      .toDF("text")
    val wd = weird.select(Bpe.tokenCount(col("text")).as("nat"),
        Bpe.tokenCountBuiltin(col("text")).as("ref"))
      .filter(col("nat") =!= col("ref")).count()
    assert(wd == 0L)
  }

  test("tokenizer_fertility: per-lang sums reconcile with the per-doc gate " +
    "and the milli ratios floor exactly") {
    val fert = SparkEntry.queries("tokenizer_fertility")(spark, sf0001)
      .collect()
    assert(fert.nonEmpty)
    val perDoc = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull)
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.functions.sum(
        Bpe.tokenCount(col("text")).cast("long")).as("bpe"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fert.foreach { r =>
      val (lang, bpe, words, chars) = (r.getString(0),
        r.getAs[Long]("bpe_tokens"), r.getAs[Long]("words"),
        r.getAs[Long]("chars"))
      assert(perDoc(lang) == bpe, s"$lang: ${perDoc(lang)} != $bpe")
      assert(r.getAs[Long]("fertility_milli") == bpe * 1000 / words)
      assert(r.getAs[Long]("chars_per_token_milli") == chars * 1000 / bpe)
      // fertility >= 1000: BPE never merges across word boundaries
      assert(r.getAs[Long]("fertility_milli") >= 1000L)
    }
  }

  test("every merge operand is a single char or an earlier merge's product " +
    "(table-order application is well-formed)") {
    val produced = scala.collection.mutable.Set.empty[String]
    Bpe.merges.foreach { case (a, b) =>
      assert(a.length == 1 || produced.contains(a), s"unreachable left '$a'")
      assert(b.length == 1 || produced.contains(b), s"unreachable right '$b'")
      produced += (a + b)
    }
  }
}
