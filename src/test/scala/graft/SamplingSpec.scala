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

  test("temperatureSample: rarest language keeps everything, head " +
    "languages sample down by sqrt, deterministic at any partitioning") {
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = totals.values.min
    val minLang = totals.collectFirst { case (l, n) if n == nMin => l }.get
    def run(parts: Int) = Sampling
      .temperatureSample(docs.repartition(parts), "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = run(1)
    assert(kept == run(7), "temperature sample depends on partitioning")
    val keptByLang = Sampling.temperatureSample(docs, "doc_id", "lang")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptByLang(minLang) == totals(minLang),
      "rarest language must keep 100%")
    totals.foreach { case (l, n) =>
      val expect = math.sqrt(nMin.toDouble / n) * n
      val got = keptByLang.getOrElse(l, 0L).toDouble
      assert(math.abs(got - expect) <= math.max(5.0, 0.25 * expect),
        s"$l kept $got, expected ~$expect of $n")
    }
  }

  test("weightedHashSample: w=0 keeps nothing, w=1 keeps everything, " +
    "keep rate tracks the weight, identical at any partitioning") {
    val weighted = docs.withColumn("w",
      (col("doc_id") % 2).cast("double") * 0.5) // alternating 0.0 / 0.5
    assert(Sampling.weightedHashSample(
      weighted.withColumn("w", lit(0.0)), "doc_id", col("w")).count() == 0L)
    assert(Sampling.weightedHashSample(
      weighted.withColumn("w", lit(1.0)), "doc_id", col("w")).count() ==
      docs.count())
    val kept = Sampling.weightedHashSample(weighted, "doc_id", col("w"))
    assert(kept.filter(col("w") === 0.0).count() == 0L,
      "zero-weight rows must never survive")
    val half = weighted.filter(col("w") === 0.5).count().toDouble
    val rate = kept.count() / half
    assert(math.abs(rate - 0.5) < 0.2, s"keep rate $rate far from weight 0.5")
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.weightedHashSample(weighted.repartition(7), "doc_id",
      col("w")).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "weighted sample must be layout-independent")
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

  test("chunkTokens: stride overlap, short-doc single chunk, tail kept, " +
    "blank/null dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: 2 chunks @ w=6,s=4
      (2L, "one two"),                                 // short: 1 chunk
      (3L, "   "),                                     // blank: dropped
      (4L, null.asInstanceOf[String]))                 // null: dropped
      .toDF("doc_id", "text")
    val out = graft.operators.Reshape
      .chunkTokens(df, "doc_id", "text", window = 6, stride = 4)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
    assert(byDoc(2L).map(_.getString(2)).toSeq == Seq("one two"))
    val c1 = byDoc(1L).map(r => (r.getInt(1), r.getString(2)))
    assert(c1.toSeq == Seq(
      (0, "t1 t2 t3 t4 t5 t6"),
      (1, "t5 t6 t7 t8 t9 t10")), s"got ${c1.toSeq}")
    assert(byDoc(1L).forall(_.getInt(3) <= 6), "chunk exceeded window")
  }

  test("fraction bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sampling.hashSample(docs, "doc_id", 1.5)
    }
  }

  test("splitAssign: bands summing to 1 cover every row exactly once; " +
    "assignment is a pure function of the key") {
    import spark.implicits._
    val rows = (1L to 500L).toDF("id")
    val bands = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitAssign(rows, "id", bands).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size == 500, "full-coverage split dropped rows")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // re-run on a differently-partitioned frame: identical assignment
    val b = Sampling.splitAssign(rows.repartition(7), "id", bands).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split depends on partitioning")
    // rough proportions (hash-uniform: 500 rows, generous tolerance)
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 300 && n("val") > 10 && n("test") > 10, s"skew: $n")
  }

  test("splitAssign: bands summing below 1 leave a deterministic holdout; " +
    "bad bands fail fast") {
    import spark.implicits._
    val rows = (1L to 400L).toDF("id")
    val split = Sampling.splitAssign(rows, "id",
      Seq("train" -> 0.5, "val" -> 0.25))
    val got = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size < 400, "holdout rows must be dropped")
    // the holdout is stable: re-running yields the same kept set
    val again = Sampling.splitAssign(rows, "id",
      Seq("train" -> 0.5, "val" -> 0.25)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == again)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(rows, "id", Seq("a" -> 0.9, "b" -> 0.2))
    }
  }

  test("doremi step: alphas form a distribution, order follows excess, " +
    "and the uniform-smoothing floor holds") {
    val rows = SparkEntry.queries("corpus_doremi_step")(spark, sf0001)
      .collect()
    val alphas = rows.map(_.getAs[Double]("alpha"))
    assert(math.abs(alphas.sum - 1.0) < 1e-9,
      s"alphas must sum to 1, got ${alphas.sum}")
    // multiplicative weights: higher excess loss => strictly higher alpha
    val byExcess = rows.sortBy(_.getAs[Double]("excess")).map(
      _.getAs[Double]("alpha"))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a < b })
    // smoothing: every domain keeps at least c/k mixture mass
    assert(alphas.forall(_ >= 0.125 / rows.length))
  }

  test("curriculumStages: stage is monotone in score, covers every row, " +
    "sizes are even up to tie classes, and layout cannot move a row") {
    import spark.implicits._
    // 40 rows over 8 score classes (5 each): stages of 10 = 2.5 classes,
    // so boundaries land mid-class and whole-class assignment must shift
    val rows = (0 until 40).map(i => (i.toLong, (i / 5).toLong * 100))
      .toDF("id", "score")
    val got = Sampling.curriculumStages(rows, "id", "score", stages = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("score"),
        r.getAs[Long]("stage")))
    assert(got.length == 40)
    // higher score never lands in a later-numbered... earlier stage check:
    // stage must be non-increasing as score increases
    val byScore = got.groupBy(_._2).map { case (s, g) =>
      assert(g.map(_._3).distinct.length == 1, s"score class $s split")
      s -> g.head._3
    }
    byScore.toSeq.sortBy(-_._1).map(_._2).foldLeft(0L) { (prev, st) =>
      assert(st >= prev, "stage decreased as score dropped"); st }
    // whole-class rule: stage(score) = floor(before * 4 / 40) + 1
    assert(byScore(700L) == 1 && byScore(600L) == 1 && byScore(500L) == 2)
    // layout independence
    val re = Sampling.curriculumStages(rows.repartition(7), "id", "score", 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("stage"))).toMap
    got.foreach { case (id, _, st) => assert(re(id) == st) }
  }

  test("splitLeakage flags exactly the near-dup pairs that straddle splits") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val splits = Seq(1L -> "train", 2L -> "test", 3L -> "train",
      4L -> "train", 5L -> "val", 6L -> "train").toDF("doc_id", "split")
    val got = Sampling.splitLeakage(pairs, splits)
      .orderBy("a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    // (1,2) train/test leaks; (3,4) same split is clean; (5,6) val/train leaks
    assert(got.toSeq == Seq((1L, 2L, "train", "test"), (5L, 6L, "val", "train")))
  }

  test("split_leakage_audit gate: every flagged pair is a verified near-dup " +
    "with endpoints in different splits") {
    val flagged = SparkEntry.queries("split_leakage_audit")(spark, sf0001)
      .collect()
    assert(flagged.nonEmpty, "planted perturbed copies must leak across splits")
    assert(flagged.forall(r => r.getString(2) != r.getString(3)))
    // endpoints carry the labels the split gate itself would assign
    val audited = Sampling.splitAssign(
        SparkEntry.queries("dedup_minhash")(spark, sf0001)
          .select(col("a").as("doc_id")).distinct(),
        keyCol = "doc_id",
        bands = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flagged.forall(r => audited(r.getLong(0)) == r.getString(2)))
  }
}
