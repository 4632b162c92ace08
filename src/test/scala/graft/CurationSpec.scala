package graft

import graft.plans.Curation

/** Composed curation pipeline: every stage must prune its planted victim
  * and the survivors pack into bins. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val goodEn =
    "the quick brown fox jumps over the lazy dog with many unique extra words"

  test("dup, contaminated, non-english, short, repetitive docs drop; survivors pack") {
    val docs = Seq(
      (1L, "s", goodEn + " first"),
      (2L, "s", goodEn + " first"),                    // exact dup of 1 -> dedup drops
      (3L, "s", "alpha beta gamma " + goodEn),         // shares bench 3-gram -> decontam drops
      (4L, "s", "der die das und ist nicht mit ein zu von der die das und ist"), // de -> langid drops
      (5L, "s", "the too short"),                      // < 10 tokens -> quality drops
      (6L, "s", "the spam spam spam spam spam spam spam spam spam spam spam"), // uniq 2/12 -> quality drops
      (7L, "s", goodEn + " second"),
      (97L, "s", "alpha beta gamma delta epsilon")     // benchmark split (97 % 97 == 0)
    ).toDF("doc_id", "source", "text")
    val out = Curation.curate(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "s" && r.getLong(1) == 0L) // one bin
    assert(r.getLong(2) == 2L)                          // docs 1 and 7 survive
    assert(r.getLong(4) == 1L && r.getLong(5) == 7L)
  }

  test("empty corpus packs to zero bins") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(Curation.curate(docs).collect().isEmpty)
  }

  test("curate_to_shards: every planted exact-tier victim is dropped by " +
    "its designated stage, the diag and composite agree, and the scan " +
    "budget is pinned") {
    import org.apache.spark.sql.functions.col
    val dir = sf0001
    val staged = SparkEntry.queries("curate_to_shards_diag_staged")(spark, dir)
      .collect()
    // +200000 exact copies NEVER survive: copies of crawl docs fall to
    // exact dedup (identical text incl. planted boilerplate), copies of
    // bench docs to decontamination (their stripped text IS the bench
    // text). +300000 perturbed copies are near-tier victims where the
    // perturbation bites; a doc without the perturbed word is an exact
    // copy and falls to the exact tier instead.
    val ids = staged.map(_.getLong(0)).toSet
    assert(!ids.exists(id => id >= 200000L && id < 300000L),
      s"exact-tier victims survived: ${ids.filter(id => id >= 200000L && id < 300000L)}")
    // no benchmark doc leaks into the curated corpus
    assert(!ids.exists(id => id < 200000L && id % 97 == 0))
    // stages span the curriculum range and the composite's doc count
    // equals the diag's
    val stages = staged.map(_.getLong(2)).toSet
    assert(stages.subsetOf(Set(1L, 2L, 3L, 4L)) && stages.size >= 2,
      s"stages: $stages")
    val manifest = SparkEntry.queries("curate_to_shards")(spark, dir).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == staged.length)
    // binning invariants (the rule is floor(running-sum/budget), so a
    // bin may overflow by its straddling last doc — never by a whole
    // doc's worth of slack): bins are contiguous 0..max per stage, and
    // token mass is conserved bin-by-bin
    manifest.groupBy(_.getAs[Long]("stage")).foreach { case (st, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted
      assert(bins.sameElements(0L to bins.max), s"stage $st bins: ${bins.toSeq}")
    }
    val shards = manifest.map(_.getAs[Int]("shard"))
    assert(shards.forall(s => s >= 0 && s < 16))
    // scan budget: the composed plan reads `documents` a FIXED number of
    // times (4 crawl/bench constructions × the scrub consumers) plus the
    // curriculum checkpoint; a refactor that re-derives a stage shows up
    // as a higher count here (the curate_report budget discipline)
    def scans(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("(FileScan parquet|Scan parquet)".r.findAllIn(p).length,
        "Scan ExistingRDD".r.findAllIn(p).length,
        "FileScan binaryFile".r.findAllIn(p).length)
    }
    // (0, 3, 0): the whole stage 1–7 chain runs ONCE, eagerly, into the
    // curriculum checkpoint at construction (curriculumStages' dual-
    // consumer discipline) — the final plan reads that checkpoint only;
    // a refactor that re-derives any upstream stage in the final plan
    // surfaces as parquet scans reappearing here
    val fresh = SparkEntry.queries("curate_to_shards")(spark, dir)
    assert(scans(fresh) == ((0, 3, 0)), s"scan budget moved: ${scans(fresh)}")
  }

  test("curate_report: section counts equal the standalone gated " +
    "components, and the composed plan scans documents exactly as often " +
    "as the components do on their own — composition re-computes nothing") {
    import org.apache.spark.sql.functions.col
    val dir = sf0001
    val rep = SparkEntry.queries("curate_report")(spark, dir)
    val vals = rep.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(vals.size == 20)
    val fused = SparkEntry.queries("quality_fused")(spark, dir)
    assert(vals(("quality", "n_scored")) == fused.count())
    assert(vals(("quality", "n_pass")) == fused.filter(col("pass")).count())
    assert(vals(("dedup", "near_dup_pairs")) ==
      SparkEntry.queries("dedup_minhash")(spark, dir).count())
    val ex = SparkEntry.queries("dedup_exact")(spark, dir)
    assert(vals(("dedup", "n_unique_texts")) == ex.count())
    // every doc planted as a full copy: duplicates == unique texts with
    // non-null content
    assert(vals(("dedup", "exact_dup_docs")) >= vals(("dedup", "n_unique_texts")) - 1)
    assert(vals(("contamination", "n_contaminated_docs")) ==
      SparkEntry.queries("decontaminate")(spark, dir).count())
    val docs = graft.sources.Tables.documents(spark, dir)
    assert(vals(("profile", "n_docs")) == docs.count())

    // multimodal sections (r15): counts equal the standalone gated
    // components read back from the SAME spool-memoized fixtures
    assert(vals(("images", "png_near_dup_pairs")) ==
      SparkEntry.queries("dedup_image_lsh")(spark, dir).count())
    assert(vals(("audio", "wav_near_dup_pairs")) ==
      SparkEntry.queries("dedup_audio_lsh")(spark, dir).count())
    val pngStrip = SparkEntry.queries("multimodal_metadata_strip")(spark, dir)
    assert(vals(("images", "png_files")) == pngStrip.count())
    assert(vals(("images", "png_pixels_intact")) == pngStrip.count())
    val wavStrip =
      SparkEntry.queries("multimodal_wav_metadata_strip")(spark, dir)
    assert(vals(("audio", "wav_files")) == wavStrip.count())
    assert(vals(("audio", "wav_samples_intact")) == wavStrip.count())

    // scan parity: the composed plan's (parquet, checkpoint-RDD,
    // binaryFile) scan counts equal the SUM over the standalone section
    // plans — profile (1,0,0) + quality (0,1,0: fusedSignals' ONE corpus
    // scan runs eagerly into its per-doc checkpoint at construction; the
    // report's aggregate never reads entropy_nats, so Catalyst ELIMINATES
    // the left join against the entropy aggregate and with it the
    // explode+ln branch — one checkpoint read remains) + dedup (2,0,0:
    // the two STAGED
    // dedup-tier parquet spools, exact + near-dup pairs — the r16 fix;
    // the shingle→band→verify derivation is measured by dedup_minhash
    // alone) + decontam (2,0,0) + images strip/LSH (0,0,3)
    // + audio strip/LSH (0,0,3); if a refactor made a section run an
    // operator twice, the left side rises and this pins it
    def scans(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("(FileScan parquet|Scan parquet)".r.findAllIn(p).length,
        "Scan ExistingRDD".r.findAllIn(p).length,
        "FileScan binaryFile".r.findAllIn(p).length)
    }
    // a FRESH frame: after an action, AdaptiveSparkPlan.toString prints
    // the final AND the initial plan, double-counting every node
    val fresh = SparkEntry.queries("curate_report")(spark, dir)
    assert(scans(fresh) == ((5, 1, 6)), s"scan budget moved: ${scans(fresh)}")
  }

  test("curate_to_shards: a planted rotation mega-bucket family is bounded " +
    "by the cap INSIDE the composite — the capped run keeps every rotation " +
    "(its pairs are forgone and itemized in the report, never judged), " +
    "while a cap wider than the family collapses it to its min id") {
    val words = graft.functions.SketchOracleSql.RotationWords
    val base = graft.functions.SketchOracleSql.RotationFamilyBase
    // pairwise-distinct texts, identical distinct-shingle set: the family
    // survives the exact tier and lands in ONE width-40 bucket per band
    val fam = words.indices.map { r =>
      val rot = (words.drop(r) ++ words.take(r)).mkString(" ")
      (base + r, "planted", rot + " " + rot)
    }
    val crawl = (fam ++ Seq(
      (1L, "s", goodEn + " first"),
      (2L, "s", goodEn + " second"))).toDF("doc_id", "source", "text")
    val bench = Seq((97L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val (staged16, report16) = Curation.curateStagedWithReport(
      crawl, bench, maxBucketWidth = 16)
    val ids16 = staged16.select("doc_id").collect().map(_.getLong(0)).toSet
    val missing = words.indices.map(base + _).filterNot(ids16)
    assert(missing.isEmpty,
      s"capped run must keep every rotation: missing ${missing.take(5)}")
    val rep = report16.collect()
    assert(rep.length == 16,
      s"each of the 16 bands must report the one family bucket: got ${rep.length}")
    assert(rep.forall(r => r.getAs[Long]("width") == 40L &&
      r.getAs[Long]("pairs_dropped") == 780L),
      s"report rows must carry (width=40, pairs_dropped=780): ${rep.take(3).toSeq}")
    // cap ABOVE the family width: the guard stays quiet and the greedy
    // min-id near-dup rule collapses the family (every rotation pairs at
    // Jaccard 1.0 with the smaller ids)
    val (staged64, report64) = Curation.curateStagedWithReport(
      crawl, bench, maxBucketWidth = 64)
    val famSurvivors = staged64.select("doc_id").collect().map(_.getLong(0))
      .filter(_ >= base).toSet
    assert(famSurvivors == Set(base),
      s"wide-cap run must collapse the family to its min id: $famSurvivors")
    assert(report64.limit(1).collect().isEmpty,
      "no bucket exceeds width 64 on this corpus - the report must be empty")
  }

  test("curate_incremental scan budget: the composed manifest plan reads " +
    "ONLY checkpoints (the novelty seam + the curriculum cut), never " +
    "re-deriving an upstream stage as a parquet scan") {
    val dir = sf0001
    def scans(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("(FileScan parquet|Scan parquet)".r.findAllIn(p).length,
        "Scan ExistingRDD".r.findAllIn(p).length,
        "FileScan binaryFile".r.findAllIn(p).length)
    }
    val fresh = SparkEntry.queries("curate_incremental")(spark, dir)
    // (0, 3, 0): the whole chain — novelty gate, filters, decontamination
    // gram probe — runs ONCE, eagerly, into the curriculum checkpoint at
    // construction; the final plan reads only that checkpoint (the same
    // budget as curate_to_shards). A refactor that re-derives any stage
    // in the final plan surfaces as parquet scans reappearing here.
    assert(scans(fresh) == ((0, 3, 0)), s"scan budget moved: ${scans(fresh)}")
  }

  test("curateIncrement: exact corpus copies drop with the corpus match id, " +
    "perturbed copies drop as near matches, novel docs survive to the " +
    "manifest, and every batch doc gets exactly one verdict row") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (10L, goodEn + " corpus one with data inside the text body somewhere"),
      (11L, goodEn + " corpus two unrelated content entirely different words"),
      (12L, "einzelgaenger zweiter dritter vierter fuenfter sechster " +
        "siebter achter neunter zehnter elfter zwoelfter")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact copy of corpus doc 10 (raw == curated here: no PII tokens)
      (100L, "b", goodEn + " corpus one with data inside the text body somewhere"),
      // near copy of corpus doc 10 (one word swapped)
      (101L, "b", goodEn + " corpus one with info inside the text body somewhere"),
      // genuinely novel English doc
      (102L, "b", goodEn + " a genuinely new document about fresh topics today"),
      // novel but non-English -> survives the novelty gate, dies at langid
      (103L, "b", "der die das und ist nicht mit ein zu von der die das und ist")
    ).toDF("doc_id", "source", "text")
    val bench = Seq((97L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val (manifest, verdicts) = Curation.curateIncrement(batch, corpus, bench)
    val v = verdicts.collect().map(r => r.getLong(0) ->
      (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(v.size == 4, s"one verdict per batch doc: ${v.keySet}")
    assert(v(100L) == (("dup_exact", Some(10L))), s"100: ${v(100L)}")
    assert(v(101L)._1 == "dup_near" && v(101L)._2 == Some(10L), s"101: ${v(101L)}")
    assert(v(102L)._1 == "novel" && v(102L)._2.isEmpty, s"102: ${v(102L)}")
    assert(v(103L)._1 == "novel", s"103: ${v(103L)}")
    // manifest: only the novel ENGLISH doc packs (103 dies at langid)
    val m = manifest.collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 1L, m.toSeq.toString)
    assert(m.head.getAs[Long]("first_doc") == 102L)
  }
}
