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

  test("fuzzyVerdict: verdict column is consistent with its evidence " +
    "columns, clean docs absent") {
    val rows = SparkEntry.queries("decontaminate_fuzzy")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact_hits")
      val fuzzyHit = !r.isNullAt(r.fieldIndex("bench_id"))
      val verdict = r.getAs[String]("verdict")
      val expected =
        if (exact > 0 && fuzzyHit) "both"
        else if (exact > 0) "exact" else "fuzzy"
      assert(verdict == expected, s"row $r")
      if (fuzzyHit) assert(r.getAs[Double]("jaccard") >= 0.6)
    }
  }

  test("fuzzyVerdict: planted eval docs whose copy is verbatim (no 'data' " +
    "token, so the perturbation is identity) are always verdict 'both'") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    // identity copies have jaccard 1.0 and identical MinHash signatures:
    // banding surfaces them with probability 1, so 'both' is guaranteed
    val verbatim = docs.filter(col("doc_id") % 97 === 0 &&
        col("text").isNotNull &&
        !col("text").rlike("\\bdata\\b") &&
        size(split(trim(col("text")), "\\s+")) >= lit(3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(verbatim.nonEmpty, "fixture lost its verbatim planted eval docs")
    val byId = SparkEntry.queries("decontaminate_fuzzy")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("verdict")).toMap
    verbatim.foreach { id =>
      assert(byId.get(id).contains("both"), s"doc $id: ${byId.get(id)}")
    }
  }
}
