package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Fns, TextFns}
import graft.operators.{Decontaminate, Packing}

/** End-to-end LLM training-data curation — the composed form of the
  * engine's text operators, in the order a production pipeline runs them:
  *
  *  1. PII scrub ([[TextFns.redactPii]]) — narrow, first so every later
  *     stage (hashes, grams) sees canonical text;
  *  2. exact dedup keeping the min doc id per cleaned content (the
  *     rank-1 window form: WindowGroupLimit prunes losers map-side);
  *  3. benchmark decontamination ([[Decontaminate.overlap]], broadcast
  *     bench grams) — contaminated docs dropped via left-anti;
  *  4. language filter (en, [[TextFns.langIdFrom]] over a materialized
  *     stopword-hits column);
  *  5. quality filter (min token count + min unique-token ratio);
  *  6. context-window packing ([[Packing.packStats]], shard-partitioned).
  *
  * Stage order is also the cost order: each narrow filter shrinks the
  * corpus before the next wider stage, and the only shuffles in the whole
  * plan are the dedup hash partition, the decontamination hit count, and
  * the per-shard packing window. Filters that need only cheap columns run
  * before anything tokenizes twice.
  */
object Curation {

  /** Returns the packed-bin stats of the curated corpus:
    * `(source, bin, n_docs, bin_tokens, first_doc, last_doc)`. */
  def curate(docs: DataFrame, benchMod: Int = 97, nGram: Int = 3,
             minTokens: Int = 10, minUniq: Double = 0.3,
             budget: Int = 512): DataFrame = {
    val scrubbed = docs.select(col("doc_id"), col("source"),
      TextFns.redactPii(col("text")).as("text"))
    val bench = scrubbed.filter(col("doc_id") % benchMod === 0)
    val corpus = scrubbed.filter(col("doc_id") % benchMod =!= 0)
    // deduped feeds two subtrees (the decontamination gram scan and the
    // surviving-docs main path), so the scrub+dedup prefix executes twice.
    // Measured at sf0.1: persisting it here is a net LOSS (2.9 s vs 2.6 s
    // — cache materialization costs more than the narrow re-scan saves).
    // At cluster scale the call is the pipeline operator's, not this
    // library's: stage the dedup output to storage between stages when the
    // corpus re-scan dominates.
    val deduped = corpus
      .withColumn("__h", md5(Fns.cleanText(col("text"))))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__h")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
    // contamination is a PER-DOCUMENT property, so the gram probe runs on
    // the pre-dedup corpus: the anti-join below only consults flags for
    // docs that survived dedup, and a doc's flag does not depend on which
    // other docs exist — identical result, but this subtree skips the
    // md5+rank-1 dedup shuffle that the main path already pays (the plan
    // previously executed the whole scrub+dedup prefix twice)
    val contaminated = Decontaminate.overlap(corpus, bench, n = nGram)
    val decontam = deduped.join(contaminated.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val english = decontam
      .withColumn("__hits", TextFns.stopwordHits(col("text")))
      .filter(TextFns.langIdFrom(col("text"), col("__hits")) === lit("en"))
      .drop("__hits")
    val quality = english
      .withColumn("__toks", TextFns.tokens(col("text")))
      .withColumn("__n", when(col("__toks").isNotNull, size(col("__toks"))))
      .filter(col("__n") >= minTokens &&
        (size(array_distinct(col("__toks"))).cast("double") / col("__n")) >= minUniq)
      .drop("__toks", "__n")
    Packing.packStats(quality, budget = budget)
  }
}
