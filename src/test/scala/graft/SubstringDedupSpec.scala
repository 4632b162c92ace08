package graft

import org.apache.spark.sql.functions._

import graft.operators.SubstringDedup
import graft.sources.Tables

/** Duplicate-span detection: planted shared substrings, span merge,
  * layout-independence. */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private val shared10 = "a b c d e f g h i j" // exactly one w=10 window

  test("a 10-token run shared by two docs surfaces as one span in each") {
    val docs = Seq(
      (1L, s"x1 x2 x3 $shared10 y1 y2"),
      (2L, s"z1 $shared10 z2 z3 z4 z5"),
      (3L, "entirely unrelated tokens only here nothing shared at all ok")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.duplicateSpans(docs, w = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val d1 = out(0); val d2 = out(1)
    // doc 1: tokens 3..12 hold the run; doc 2: tokens 1..10
    assert(d1.getInt(1) == 3 && d1.getInt(2) == 12 && d1.getLong(3) == 1L)
    assert(d2.getInt(1) == 1 && d2.getInt(2) == 10 && d2.getLong(3) == 1L)
  }

  test("overlapping duplicated windows merge into ONE maximal span") {
    // 12 shared tokens -> 3 marked windows at w=10 (starts 0,1,2 in doc 4),
    // all overlapping: must merge to a single span covering all 12 tokens
    val run12 = shared10 + " k l"
    val docs = Seq(
      (4L, run12),
      (5L, s"pre1 pre2 $run12")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.duplicateSpans(docs, w = 10)
      .filter($"doc_id" === 4L).collect()
    assert(out.length == 1, s"expected one merged span, got ${out.length}")
    assert(out.head.getInt(1) == 0 && out.head.getInt(2) == 11 &&
      out.head.getLong(3) == 3L)
  }

  test("disjoint duplicated regions stay separate spans") {
    val runA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val runB = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val docs = Seq(
      (6L, s"$runA gap1 gap2 gap3 $runB"),
      (7L, runA),
      (8L, runB)
    ).toDF("doc_id", "text")
    val spans6 = SubstringDedup.duplicateSpans(docs, w = 10)
      .filter($"doc_id" === 6L).orderBy("span_start").collect()
    assert(spans6.length == 2)
    assert(spans6(0).getInt(1) == 0 && spans6(0).getInt(2) == 9)
    assert(spans6(1).getInt(1) == 13 && spans6(1).getInt(2) == 22)
  }

  test("within-doc repetition alone does not mark (cross-doc contract) " +
    "and short docs are absent") {
    val docs = Seq(
      (9L, s"$shared10 $shared10"), // repeats internally, no other doc has it
      (10L, "too short")
    ).toDF("doc_id", "text")
    assert(SubstringDedup.duplicateSpans(docs, w = 10).count() == 0L)
  }

  test("result is identical at any partitioning") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "\\bdata\\b", "info").as("text"))
    val corpus = docs.unionByName(perturbed)
    def run(parts: Int) = SubstringDedup
      .duplicateSpans(corpus.repartition(parts))
      .orderBy("doc_id", "span_start")
      .collect().map(_.toSeq).toSeq
    val a = run(1); val b = run(13)
    assert(a.nonEmpty && a == b)
  }
}
