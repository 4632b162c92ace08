package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark decontamination — the standard pre-training hygiene pass:
  * flag corpus documents that share word n-grams with an evaluation
  * benchmark, so eval data can be excluded from training (the GPT-3
  * appendix-C / PaLM-style n-gram overlap check; production deployments
  * use 8–13-gram windows, `n` is a parameter here).
  *
  * Scale shape: the benchmark side is DISTINCT n-grams of the eval suites
  * — megabytes against a 100 TB corpus — so it is explicitly `broadcast`:
  * the corpus side is scanned once, its grams probed map-side against the
  * broadcast hash relation, and the only shuffle is the per-document
  * partial-aggregated hit count over the (tiny) matching subset. Grams
  * ship as 64-bit `xxhash64` values, not strings — same contract as the
  * dedup verify joins (equal up to 64-bit collisions, a fraction of the
  * bytes).
  */
object Decontaminate {

  /** Per-document count of distinct word n-grams shared with `bench`.
    * Documents with zero overlap are absent (filter with a left-anti join
    * to get the clean set). `TextFns.wordShingles` yields DISTINCT grams
    * per document, so no per-doc dedup shuffle is needed before the count.
    * NULL-text documents produce no grams on either side. */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", n: Int = 3): DataFrame = {
    val benchGrams = bench
      .select(explode(TextFns.wordShingles(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .distinct()
    val corpusGrams = corpus
      .select(col(idCol), explode(TextFns.wordShingles(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
    corpusGrams.join(broadcast(benchGrams), Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Combined exact + fuzzy decontamination verdict — the two-detector
    * hygiene pass a production pipeline runs: exact n-gram [[overlap]]
    * catches verbatim eval text, and MinHash near-dup matching
    * ([[Dedup.incrementalNearDups]] with the corpus as the probe side)
    * catches PARAPHRASED eval data that shares too few exact n-grams.
    * Output is one row per CONTAMINATED document:
    * `(idCol, n_exact_hits, bench_id, jaccard, verdict)` with verdict in
    * {exact, fuzzy, both}; clean documents are absent (left-anti against
    * this frame yields the publishable corpus).
    *
    * Scale shape: both detectors reduce to benchmark-sized frames before
    * this method joins them — the full-outer join is contaminated-set ×
    * contaminated-set, never corpus-sized, so the whole verdict stage is
    * broadcastable no matter how large the training corpus is. */
  def fuzzyVerdict(corpus: DataFrame, bench: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val exact = overlap(corpus, bench, idCol, textCol, n)
      .withColumnRenamed("n_hits", "n_exact_hits")
    val fuzzy = Dedup.incrementalNearDups(corpus, bench, idCol, textCol,
        threshold)
      .select(col("batch_id").as(idCol), col("match_id").as("bench_id"),
        col("jaccard"))
    exact.join(fuzzy, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"),
        col("bench_id"), col("jaccard"),
        when(col("n_exact_hits").isNotNull && col("bench_id").isNotNull,
          lit("both"))
          .when(col("n_exact_hits").isNotNull, lit("exact"))
          .otherwise(lit("fuzzy")).as("verdict"))
  }
}
