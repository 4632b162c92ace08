package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over a document corpus — BM25 (Robertson/
  * Spärck Jones probabilistic weighting, the Okapi formulation with the
  * +1-smoothed idf used by Lucene). A training-data engine needs this for
  * corpus exploration, topic-targeted curation, and building retrieval
  * eval sets next to the ANN operators in [[Similarity]].
  *
  * Scale design — the plan deliberately avoids the classic
  * explode-and-shuffle inverted-index build:
  *  - per-document term frequencies are NARROW: `filter(tokens, t = term)`
  *    per query term, computed in one pass over the scan with zero
  *    shuffle (query terms are a handful; a tf column each);
  *  - corpus statistics (N, Σdl, per-term document frequency) are ONE
  *    tiny aggregate row, broadcast back via a crossJoin — the only
  *    shuffle in the plan besides the final top-k;
  *  - the top-k is a TakeOrdered over scored rows (per-partition partial
  *    top-k, no global sort materialization).
  * At 100 TB this is two passes over the corpus scan (stats + score) and
  * ships k rows to the driver; an inverted-index build would shuffle the
  * full token stream. Document length goes through an exact decimal sum so
  * avgdl — and therefore every score — is partition-count invariant.
  */
object Retrieval {

  /** Top-`k` documents by BM25 score for the conjunction-free bag of
    * `terms`. Emits `(idCol, dl, tf_<term>..., score_r)` with the score
    * rounded to 6 decimals (ranking happens on the unrounded value;
    * `idCol` breaks exact ties deterministically). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      "bm25TopK: 1..16 query terms (one narrow tf column each)")
    require(terms.forall(_.matches("[a-z0-9_]+")),
      "bm25TopK: terms must be lowercase token literals")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), toks.as("__toks"))
      .select(Seq(col(idCol), size(col("__toks")).as("dl")) ++
        terms.map(t => size(filter(col("__toks"), x => x === lit(t)))
          .as(s"tf_$t")): _*)
    val statCols =
      sum(col("dl").cast("decimal(18,0)")).as("__sum_dl") +:
        terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
          .as(s"df_$t"))
    val stats = base.agg(count(lit(1)).as("n_docs"), statCols: _*)
    // fixed left-to-right term order keeps double summation bit-identical
    // to the oracle's restatement of the same expression
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col(s"df_$t") + lit(0.5)) /
          (col(s"df_$t").cast("double") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    base.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("__sum_dl").cast("double") / col("n_docs"))
      .withColumn("__score", terms.map(termScore).reduce(_ + _))
      .orderBy(col("__score").desc, col(idCol))
      .limit(k)
      .select(Seq(col(idCol), col("dl")) ++ terms.map(t => col(s"tf_$t")) :+
        round(col("__score"), 6).as("score_r"): _*)
  }

  /** DuckDB restatement of [[bm25TopK]] for the oracle gate. */
  def bm25OracleSql(idCol: String, textCol: String, table: String,
                    terms: Seq[String], k: Int = 20,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '\\s+')"
    val tfCols = terms.map(t =>
      s"len(list_filter($toks, x -> x = '$t')) AS tf_$t").mkString(",\n    ")
    val dfCols = terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n    ")
    val score = terms.map { t =>
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5))
         | * CAST(tf_$t AS DOUBLE) * ${k1 + 1.0}
         | / (CAST(tf_$t AS DOUBLE) + $k1 * (${1.0 - b} + $b * dl / avgdl))"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(" + ")
    val tfSel = terms.map(t => s"tf_$t").mkString(", ")
    s"""WITH base AS (
       |  SELECT $idCol, len($toks) AS dl,
       |    $tfCols
       |  FROM $table
       |  WHERE $textCol IS NOT NULL AND trim($textCol) <> ''
       |), stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS avgdl,
       |    $dfCols
       |  FROM base
       |)
       |SELECT $idCol, dl, $tfSel, ROUND(score, 6) AS score_r
       |FROM (SELECT base.*, $score AS score FROM base, stats)
       |ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }
}
