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
}
