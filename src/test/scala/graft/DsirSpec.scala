package graft

import graft.operators.Dsir

/** DSIR importance selection: hashed-bigram target-vs-raw log-ratio
  * weights (Xie et al. 2023). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // a tiny corpus with a clear target domain: 'en' docs talk about
  // "alpha beta gamma", others about "zeta eta theta"; one candidate of
  // each flavor sits OUTSIDE the target slice
  private def corpus = Seq(
    (1L, "en", "alpha beta gamma alpha beta"),
    (2L, "en", "alpha beta gamma gamma alpha"),
    (3L, "de", "zeta eta theta zeta eta"),
    (4L, "de", "zeta eta theta theta zeta"),
    (5L, "fr", "alpha beta gamma alpha beta"), // target-like candidate
    (6L, "fr", "zeta eta theta zeta eta")      // off-target candidate
  ).toDF("doc_id", "lang", "text")

  test("every target-flavored doc outweighs every off-target doc " +
    "(selection is an ordering, and add-1 smoothing over the 256-bucket " +
    "space shifts tiny-corpus weights without reordering them)") {
    val got = Dsir.select(corpus, targetFilter = "lang = 'en'", k = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    val inDomain = Seq(1L, 2L, 5L)
    val offDomain = Seq(3L, 4L, 6L)
    for (i <- inDomain; o <- offDomain)
      assert(got(i) > got(o), s"doc $i must outweigh doc $o: $got")
  }

  test("n_feats counts bigram occurrences; k truncates with doc_id " +
    "tie-break; short/blank docs drop") {
    val withEdge = corpus.union(Seq(
      (7L, "en", "solo"), (8L, "en", "   ")).toDF("doc_id", "lang", "text"))
    val rows = Dsir.select(withEdge, targetFilter = "lang = 'en'", k = 3)
      .collect()
    assert(rows.length == 3)
    // every fixture doc has 5 tokens -> 4 bigram occurrences
    rows.foreach(r => assert(r.getLong(1) == 4L, r.toString))
    assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 5L)),
      "top-3 must be the in-domain docs")
  }

  test("selection is partition-layout invariant") {
    val a = Dsir.select(corpus, "lang = 'en'", k = 6).collect().toSeq
    val b = Dsir.select(corpus.repartition(7), "lang = 'en'", k = 6)
      .collect().toSeq
    assert(a == b)
  }

  test("resample: gumbel_key = weight + deterministic Gumbel noise, " +
    "rerun- and partition-invariant, ordered by the key") {
    val a = Dsir.resample(corpus, "lang = 'en'", k = 6).collect().toSeq
    val b = Dsir.resample(corpus.repartition(5), "lang = 'en'", k = 6)
      .collect().toSeq
    assert(a == b, "resampling must be a pure function of the data")
    // key reconstructs from the weight plus the hash-derived Gumbel term
    val weights = Dsir.select(corpus, "lang = 'en'", k = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    a.foreach { r =>
      val (id, w, key) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(w == weights(id))
      val g = key - w
      // Gumbel(0) support is all reals but hash-uniform u in
      // [1/16384, 1-1/16384] bounds it: -ln(-ln(u)) in about [-2.2, 9.7]
      assert(g > -3 && g < 10, s"implausible gumbel term $g for doc $id")
    }
    val keys = a.map(_.getDouble(3))
    assert(keys == keys.sorted.reverse, "output must be ordered by key desc")
    // and a different seed reorders (the noise is real, not a constant)
    val c = Dsir.resample(corpus, "lang = 'en'", k = 6, seed = "other")
      .collect().toSeq.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val aMap = a.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(aMap.keySet.intersect(c.keySet).exists(id => aMap(id) != c(id)),
      "seed must perturb the keys")
  }

  test("diagnostic truth-table gates are mutually consistent: w12 is the " +
    "integer spine of the published weights (round-half-away w12/1e6 == " +
    "w_micro) and the cell folds match a hand-rolled grid") {
    val w12 = Dsir.diagW12(corpus, "lang = 'en'")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val micro = Dsir.diagWeights(corpus, "lang = 'en'")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w12.keySet == micro.keySet)
    w12.foreach { case (id, v) =>
      val half = if (v < 0) -((-v + 500000L) / 1000000L)
                 else (v + 500000L) / 1000000L
      assert(half == micro(id), s"doc $id: w12 $v !~ w_micro ${micro(id)}")
    }
    // cell folds: recompute from the raw bigram stream with plain Scala
    val cells = Dsir.diagCells(corpus, "lang = 'en'")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val grids = corpus.collect().map { r =>
      val id = r.getLong(0)
      val toks = r.getString(2).trim.toLowerCase.split("\\s+")
      val grid = toks.sliding(2).map(_.mkString(" "))
        .map { bg =>
          val h = graft.functions.HashExprs.fnv1a64(
            bg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          java.lang.Math.floorMod(h, Dsir.Buckets.toLong)
        }.toSeq.groupBy(identity).map { case (b, o) => b -> o.size.toLong }
      id -> grid
    }.toMap
    cells.foreach { case (id, odd, sq) =>
      val g = grids(id)
      assert(odd == g.map { case (b, c) => c * (2 * b + 1) }.sum, s"doc $id")
      assert(sq == g.map { case (_, c) => c * c }.sum, s"doc $id")
    }
  }

  test("composed calls leave no CacheManager entry behind (the estimator " +
    "frame is an eager localCheckpoint, not a persist — a lazily-returned " +
    "plan can never safely unpersist, so persist would leak per call)") {
    spark.catalog.clearCache()
    Dsir.select(corpus, "lang = 'en'", k = 3).collect()
    Dsir.resample(corpus, "lang = 'en'", k = 3).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "Dsir must not register frames in the CacheManager")
  }
}
