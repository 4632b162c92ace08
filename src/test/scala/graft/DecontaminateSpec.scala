package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Decontamination: only docs sharing an n-gram with the benchmark are
  * flagged, counts are distinct-gram counts, and the bench side of the
  * plan is broadcast. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "alpha beta gamma delta")
  ).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    (1L, "alpha beta gamma unrelated tail here"),          // shares 'alpha beta gamma'
    (2L, "prefix words alpha beta gamma delta suffix"),    // shares 2 distinct 3-grams
    (3L, "totally clean document with no overlap at all"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("overlap counts distinct shared 3-grams; clean/null docs absent") {
    val got = Decontaminate.overlap(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L)) // doc 2: 'alpha beta gamma' + 'beta gamma delta'
  }

  test("repeated gram occurrences in one doc count once (shingles are distinct)") {
    val rep = Seq((9L, "alpha beta gamma and alpha beta gamma again")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(rep, bench).collect()
    assert(got.length == 1 && got.head.getLong(1) == 1L)
  }

  test("empty benchmark flags nothing") {
    val got = Decontaminate.overlap(corpus, bench.filter(lit(false)))
    assert(got.collect().isEmpty)
  }

  test("bench side is broadcast in the physical plan") {
    val plan = Decontaminate.overlap(corpus, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
