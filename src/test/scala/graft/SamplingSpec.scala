package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.Tables

/** Deterministic hash sampling: layout-independence, nesting, stratification. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("lang"))

  test("hashSample is a pure function of the data: identical rows at any " +
    "partitioning") {
    val a = Sampling.hashSample(docs.repartition(1), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("hashSample fractions nest: sample(0.2) is a subset of sample(0.6)") {
    val small = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, "doc_id", 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.nonEmpty && small.subsetOf(big))
    val n = docs.count().toDouble
    assert(math.abs(big.size / n - 0.6) < 0.15, s"got ${big.size / n}")
  }

  test("stratifiedHashSample: unmapped and zero-fraction strata drop, " +
    "fraction-1.0 strata keep everything") {
    val out = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("zh" -> 1.0, "en" -> 0.5, "fr" -> 0.0))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("fr", 0L) == 0L, "explicit 0.0 stratum leaked")
    assert(!byLang.contains("de") && !byLang.contains("es"),
      "unmapped strata must drop (sampleBy semantics)")
    assert(byLang("zh") == totals("zh"), "fraction 1.0 must keep all rows")
    assert(byLang("en") > 0 && byLang("en") < totals("en"))
  }

  test("mixCorpora: floor(w) full epochs + fractional hash-sampled epoch, " +
    "reproducible row-for-row") {
    val en = docs.filter(col("lang") === "en")
    val mix = Sampling.mixCorpora(
      Seq(("wiki", en, 2.0), ("web", docs, 0.5)), "doc_id")
    val counts = mix.groupBy("source", "epoch").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nEn = en.count()
    assert(counts(("wiki", 0)) == nEn && counts(("wiki", 1)) == nEn)
    assert(!counts.contains(("wiki", 2)), "integral weight must not sample")
    val webFrac = counts(("web", 0)).toDouble / docs.count()
    assert(math.abs(webFrac - 0.5) < 0.15, s"web fraction $webFrac")
    // reproducibility: the mix is a pure function of the data
    val again = Sampling.mixCorpora(
      Seq(("wiki", en, 2.0), ("web", docs, 0.5)), "doc_id")
    assert(mix.exceptAll(again).isEmpty && again.exceptAll(mix).isEmpty)
  }

  test("topKPerGroup keeps k per stratum, plans as WindowGroupLimit " +
    "(partial top-k before the shuffle)") {
    import org.apache.spark.sql.functions.length
    val scored = docs.withColumn("score", length(col("lang")) + col("doc_id") % 7)
    val top = Sampling.topKPerGroup(scored, "lang", "score", k = 3,
      tieBreak = "doc_id")
    val perGroup = top.groupBy("lang").count().collect().map(_.getLong(1))
    assert(perGroup.nonEmpty && perGroup.forall(_ <= 3))
    assert(top.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank filter did not plan as WindowGroupLimit")
    // determinism: same kept set under different partitioning
    val a = top.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.topKPerGroup(scored.repartition(7), "lang", "score",
      k = 3, tieBreak = "doc_id").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("fraction bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sampling.hashSample(docs, "doc_id", 1.5)
    }
  }
}
