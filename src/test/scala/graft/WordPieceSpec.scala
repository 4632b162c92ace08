package graft

import org.apache.spark.sql.functions._

import graft.functions.WordPiece
import graft.sources.Tables

/** WordPiece greedy MaxMatch: known segmentations, totality, and the
  * lossless-concatenation invariant. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def seg(ws: String*): Map[String, Seq[String]] =
    ws.toDF("word")
      .select(col("word"), WordPiece.segment(col("word")).as("toks"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1))).toMap

  test("greedy longest-match picks the longest start piece, then " +
      "continuations") {
    val got = seg("window", "customer", "stream", "sort", "table")
    assert(got("window") == Seq("wind", "##ow"))
    assert(got("customer") == Seq("cust", "##omer"))
    assert(got("stream") == Seq("stre", "##am"))
    assert(got("sort") == Seq("sort"))
    assert(got("table") == Seq("tabl", "##e"))
  }

  test("totality: out-of-vocab text degrades to single-char pieces, " +
      "never fails") {
    assert(seg("zzz")("zzz") == Seq("z", "##z", "##z"))
  }

  test("pieces concatenate back to the word; first is a start piece, " +
      "rest are ## continuations") {
    val words = Seq("spark", "vector", "query", "filter", "aggregation")
    seg(words: _*).foreach { case (w, toks) =>
      assert(toks.head.take(2) != "##")
      assert(toks.tail.forall(_.startsWith("##")))
      assert(toks.head + toks.tail.map(_.drop(2)).mkString == w)
    }
  }

  test("pieceCounts: deterministic top-k over the fixture, counts " +
      "reconcile with word frequencies") {
    val docs = Tables.documents(spark, sf0001)
    val out = WordPiece.pieceCounts(docs, "text", k = 10).collect()
    assert(out.length == 10)
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // total piece mass >= total word count (every word yields >= 1 piece)
    val totalPieces = WordPiece.pieceCounts(docs, "text", k = 10000)
      .agg(sum("n")).collect().head.getLong(0)
    val totalWords = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").count()
    assert(totalPieces >= totalWords)
  }
}
