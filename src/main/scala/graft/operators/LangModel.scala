package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the CCNet-style filter
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data", LREC 2020 — there a KenLM; here a corpus-trained
  * bigram model, the same signal at Spark-native cost): documents whose
  * token transitions are improbable under the corpus model (boilerplate,
  * gibberish, wrong-language debris) score a high average negative log
  * likelihood and can be dropped by threshold or bucketed by percentile.
  *
  * Scale shape:
  *  - the token stream is exploded ONCE; vocabulary selection is a
  *    TakeOrdered top-N (no global sort materialization) broadcast back,
  *    so out-of-vocab mapping is a map-side left join;
  *  - bigram extraction is one `lag` window per document (single shuffle
  *    on doc id); model counts are two map-side-combined aggregates over
  *    the bigram stream;
  *  - the fitted model is bounded by observed bigrams over (topVocab+1)²
  *    — broadcastable by construction — so scoring is a map-side join
  *    plus one final per-doc aggregate.
  *
  * Determinism: counts are exact integers; per-bigram NLL goes through the
  * DECIMAL(18,6) carrier so the per-doc sum is merge-order invariant; the
  * vocabulary cut breaks count ties on the token itself. */
object LangModel {

  /** Per-document average bigram negative log likelihood under an add-`k`
    * smoothed bigram model trained on the corpus itself:
    * `(idCol, n_bigrams, avg_nll)`. Documents with fewer than two tokens
    * have no transitions and are absent. `topVocab` caps the vocabulary
    * (count-desc, token tie-break); everything else maps to `<unk>`, so
    * model size is bounded no matter the corpus. */
  def bigramNll(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", addK: Double = 0.5,
                topVocab: Int = 256): DataFrame = {
    require(addK > 0 && topVocab >= 1, "bigramNll: addK > 0, topVocab >= 1")
    // persisted: stream feeds two subtrees (vocab + mapped) and bi feeds
    // three (uni/big/scored) — without the persists Spark re-executes the
    // corpus explode and the per-doc lag window once per subtree (the same
    // caching discipline as Dedup/Cluster; blocks are released by the
    // ContextCleaner once the returned plan is unreferenced)
    val stream = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("pos", "tok")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = stream.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(topVocab)
      .select(col("tok"), lit(true).as("__in"))
    val mapped = stream.join(broadcast(vocab), Seq("tok"), "left")
      .select(col(idCol), col("pos"),
        when(col("__in"), col("tok")).otherwise(lit("<unk>")).as("tok"))
    val bi = mapped
      .withColumn("prev",
        lag(col("tok"), 1).over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("prev").isNotNull)
      .select(col(idCol), col("prev"), col("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = bi.groupBy(col("prev")).agg(count(lit(1)).as("cu"))
    val big = bi.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cb"))
    val kV = addK * (topVocab + 1) // +1: the <unk> class
    val scored = bi
      .join(broadcast(big), Seq("prev", "tok"))
      .join(broadcast(uni), Seq("prev"))
      .withColumn("__nll",
        (-log((col("cb") + lit(addK)) / (col("cu") + lit(kV))))
          .cast("decimal(18,6)"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__nll")).cast("double") / count(lit(1)), 6)
          .as("avg_nll"))
  }

  /** DuckDB mirror of [[bigramNll]] over the `documents` fixture. */
  def bigramNllOracleSql(addK: Double = 0.5, topVocab: Int = 256): String = {
    val kV = addK * (topVocab + 1)
    s"""WITH base AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
       |), stream AS (
       |  SELECT doc_id, pos, toks[pos] AS tok FROM (
       |    SELECT doc_id, toks,
       |      CAST(unnest(range(1, len(toks) + 1)) AS INTEGER) AS pos
       |    FROM base)
       |), vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, COUNT(*) AS c FROM stream GROUP BY tok)
       |  ORDER BY c DESC, tok LIMIT $topVocab
       |), mapped AS (
       |  SELECT s.doc_id, s.pos,
       |    CASE WHEN v.tok IS NOT NULL THEN s.tok ELSE '<unk>' END AS tok
       |  FROM stream s LEFT JOIN vocab v ON s.tok = v.tok
       |), bi AS (
       |  SELECT doc_id, prev, tok FROM (
       |    SELECT doc_id, tok,
       |      lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |    FROM mapped)
       |  WHERE prev IS NOT NULL
       |), uni AS (
       |  SELECT prev, COUNT(*) AS cu FROM bi GROUP BY prev
       |), big AS (
       |  SELECT prev, tok, COUNT(*) AS cb FROM bi GROUP BY prev, tok
       |), scored AS (
       |  SELECT b.doc_id,
       |    CAST(-ln((g.cb + $addK) / (u.cu + $kV)) AS DECIMAL(18,6)) AS nll
       |  FROM bi b
       |  JOIN big g ON b.prev = g.prev AND b.tok = g.tok
       |  JOIN uni u ON b.prev = u.prev
       |)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
