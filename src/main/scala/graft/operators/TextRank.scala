package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, "TextRank: Bringing
  * Order into Text", EMNLP 2004): build the word co-occurrence graph
  * (window = adjacent tokens), run PageRank over it, keep the top-k
  * words — the unsupervised keyword signal a curation pipeline uses for
  * topic tagging and index-term extraction. The original filters
  * candidates by part-of-speech; with no POS tagger in a pure-Spark
  * engine the deterministic stand-in is a minimum token length
  * (documented deviation, same role: drop function words).
  *
  * Pure composition — the graph machinery IS [[Cluster.pagerank]] (fixed
  * synchronous rounds, decimal-carrier mass sums, oracle-unrollable), fed
  * by one narrow token-adjacency pass; the composition inherits its scale
  * shape: per-round cost is one shuffle join over the WORD graph (bounded
  * by vocabulary, not corpus size) after the single corpus scan that
  * builds the distinct edge set. */
object TextRank {

  /** Top-`k` keywords of the corpus: `(word, deg, pr)` ordered by rank
    * desc, word asc. */
  def keywords(docs: DataFrame, k: Int = 50, iters: Int = 3,
               minLen: Int = 3, textCol: String = "text"): DataFrame = {
    require(k >= 1 && iters >= 1 && minLen >= 1,
      "TextRank.keywords: k, iters, minLen must be >= 1")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val adj = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) >= minLen && length(col("b")) >= minLen &&
        col("a") =!= col("b"))
    Cluster.pagerank(adj, aCol = "a", bCol = "b", iters = iters,
        idOut = "word")
      .orderBy(col("pr").desc, col("word"))
      .limit(k)
  }
}
