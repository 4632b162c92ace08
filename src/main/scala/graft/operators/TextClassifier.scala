package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, SketchOracleSql}

/** Hashed bag-of-words linear quality classifier — the fastText-style
  * filter (Joulin et al., "Bag of Tricks for Efficient Text
  * Classification", EACL 2017; the hashing trick is Weinberger et al.,
  * ICML 2009) that LLM-corpus pipelines run over every document (e.g.
  * GPT-3/LLaMA's quality classifiers): token -> hash bucket -> learned
  * per-bucket weight, document score = sigmoid of the mean bucket weight.
  *
  * The Spark shape IS the production shape: the weight table is a small
  * dimension frame (`buckets` rows) broadcast to every task, tokens
  * explode once, bucketing is a codegen'd hash expression, and scoring is
  * one map-side join plus one per-doc aggregate — no driver-side model
  * object, no UDF closure serialization.
  *
  * Weights here are a deterministic hash-derived STAND-IN for trained
  * parameters (integer numerators in [-1000, 1000], carried exactly so
  * the per-doc mean is merge-order invariant); swapping in a real trained
  * model is replacing [[weightTable]] with a parquet read of the same
  * (bucket, weight_num) schema — nothing else in the plan changes. */
object TextClassifier {

  /** Deterministic per-bucket weight numerators: weight = num / 1000,
    * num = fnv1a64("qw|" + bucket) mod 2048 - 1024 (power-of-two mod so
    * the signed-pmod engine and unsigned-mod oracle agree exactly). */
  def weightTable(spark: org.apache.spark.sql.SparkSession,
                  buckets: Int): DataFrame =
    spark.range(buckets).select(col("id").as("__bucket"),
      (pmod(HashExprs.fnv1a64Col(concat(lit("qw|"), col("id").cast("string"))),
        lit(2048L)) - lit(1024L)).as("__wnum"))

  /** Per-document score: `(idCol, n_tokens, score)` with
    * score = round(sigmoid(sum(weight_num) / (1000 * n_tokens)), 6).
    * Blank documents carry no tokens and are absent. */
  def hashedLinearScore(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        buckets: Int = 4096): DataFrame = {
    require((buckets & (buckets - 1)) == 0 && buckets >= 2,
      s"buckets must be a power of two (got $buckets) — signed-pmod vs " +
        "unsigned-mod bucket reduction only coincide for 2^k")
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .select(col(idCol),
        pmod(HashExprs.fnv1a64Col(concat(lit("qb|"), col("tok"))),
          lit(buckets.toLong)).as("__bucket"))
    toks
      .join(broadcast(weightTable(docs.sparkSession, buckets)), Seq("__bucket"))
      .groupBy(col(idCol))
      // integer-exact z numerator; sigmoid+round only at the very end
      .agg(count(lit(1)).as("n_tokens"), sum(col("__wnum")).as("__z"))
      .select(col(idCol), col("n_tokens"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("__z").cast("double") / (col("n_tokens") * 1000.0)))), 6)
          .as("score"))
  }

  /** DuckDB mirror of [[hashedLinearScore]] over `documents`. */
  def hashedLinearScoreOracleSql(buckets: Int = 4096): String = {
    val bkt = SketchOracleSql.fnvFold("'qb|' || tok")
    val wnum = SketchOracleSql.fnvFold("'qw|' || CAST(b.__bucket AS VARCHAR)")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(($bkt) % $buckets AS BIGINT) AS __bucket
       |  FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |    FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
       |), weighted AS (
       |  SELECT b.doc_id,
       |    CAST(($wnum) % 2048 AS BIGINT) - 1024 AS __wnum
       |  FROM toks b
       |)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  ROUND(1.0 / (1.0 + exp(-(CAST(SUM(__wnum) AS DOUBLE) / (COUNT(*) * 1000.0)))), 6) AS score
       |FROM weighted GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
