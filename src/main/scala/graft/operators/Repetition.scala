package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TextFns}

/** Repetition-based quality signals — the Gopher repetition filters (Rae et
  * al., "Scaling Language Models: ... Gopher", 2021, table A1): documents
  * dominated by one token or by repeated n-grams are boilerplate/spam-like
  * and get filtered before pre-training.
  *
  * Signals per document:
  *  - `top_tok_frac`   — occurrences of the single most frequent token /
  *    total tokens;
  *  - `dup_bigram_frac` — fraction of bigram OCCURRENCES that are repeats
  *    of an earlier bigram: `(total - distinct) / total` with
  *    `total = n_tokens - 1` (NULL when the doc has < 2 tokens);
  *  - `symbol_ratio`   — non-alphanumeric, non-whitespace characters /
  *    total characters (NULL for empty docs);
  *  - `repetitive`     — `top_tok_frac > topThresh OR dup_bigram_frac >
  *    dupBiThresh` (three-valued: NULL signals propagate as in SQL).
  *
  * Scale shape: the only token-level wide work is the top-token mode —
  * explode → partial-aggregated count per (doc, token) → max per doc. Both
  * aggregations map-side combine, and the shuffle key (doc_id, token)
  * cannot skew beyond one document's vocabulary. The bigram and symbol
  * signals are narrow per-row array expressions (no explode at all); the
  * final join is doc_id-to-doc_id on two frames already hashed by doc_id.
  */
object Repetition {

  def signals(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", topThresh: Double = 0.2,
              dupBiThresh: Double = 0.3): DataFrame = {
    // tokens materialized ONCE as a column: higher-order/array subtrees are
    // excluded from CSE, so inlining this expression per signal would
    // re-tokenize the document per reference
    val base = docs
      .withColumn("__toks", TextFns.tokens(col(textCol)))
      .withColumn("__n", when(col("__toks").isNotNull, size(col("__toks"))))
      .withColumn("__dbi", when(col("__toks").isNotNull,
        size(TextExprs.wordShingles(col("__toks"), 2))))
    val top = base
      .select(col(idCol), explode(col("__toks")).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__top_cnt"))
    val nBi = col("__n") - 1
    base.join(top, Seq(idCol), "left")
      .select(
        col(idCol),
        col("__n").as("n_toks"),
        (col("__top_cnt").cast("double") / col("__n")).as("top_tok_frac"),
        ((nBi - col("__dbi")).cast("double") /
          when(nBi === 0, lit(null)).otherwise(nBi)).as("dup_bigram_frac"),
        (TextFns.punctCount(col(textCol)).cast("double") /
          when(length(col(textCol)) === 0, lit(null))
            .otherwise(length(col(textCol)))).as("symbol_ratio"))
      .withColumn("repetitive",
        col("top_tok_frac") > topThresh || col("dup_bigram_frac") > dupBiThresh)
  }
}
