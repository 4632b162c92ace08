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
  *  - the token explode runs twice (vocab pass + bigram pass) rather than
  *    persisting the full exploded string stream: the explode is a narrow
  *    recompute off the (column-pruned) scan, while caching one row per
  *    corpus TOKEN is exactly the executor-memory hazard a 100 TB run
  *    cannot afford — recompute-over-cache is the deliberate choice here;
  *  - vocabulary selection is a TakeOrdered top-N broadcast back as
  *    DENSE INTEGER ids, so the per-doc `lag` window and every downstream
  *    shuffle carry ints, never token strings;
  *  - the only persisted frame is the per-doc BIGRAM COUNT aggregate
  *    (doc, prev, tok, c) — the smallest frame in the pipeline (bounded by
  *    per-doc distinct transitions) — from which the corpus bigram counts,
  *    the unigram counts (a further rollup of the bigram counts — no extra
  *    pass over the stream), and the per-doc scores all derive;
  *  - the fitted model is bounded by observed bigrams over (topVocab+1)²
  *    — broadcastable by construction — so scoring is a map-side join
  *    plus one final per-doc aggregate.
  *
  * Determinism: counts are exact integers; per-bigram NLL goes through the
  * DECIMAL(18,6) carrier (multiplied exactly by the integer repeat count)
  * so the per-doc sum is merge-order invariant; the vocabulary cut breaks
  * count ties on the token itself. */
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
    def stream = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("pos", "tok")))
    // dense int ids for the kept vocabulary (TakeOrdered top-N; the
    // row_number window runs over topVocab rows, not the corpus)
    val byCount = Window.orderBy(col("c").desc, col("tok"))
    val vocab = stream.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(topVocab)
      .select(col("tok"), (row_number().over(byCount) - 1).as("tid"))
    val unkId = topVocab // one id past the kept vocab = the <unk> class
    val mapped = stream.join(broadcast(vocab), Seq("tok"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("tid"), lit(unkId)).as("tid"))
    val bi = mapped
      .withColumn("ptid",
        lag(col("tid"), 1).over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("ptid").isNotNull)
      .select(col(idCol), col("ptid"), col("tid"))
    // the ONE persisted frame: per-doc bigram counts (int keys) — feeds
    // the model rollups and the scoring join; released by the
    // ContextCleaner once the returned plan is unreferenced
    val dbc = bi.groupBy(col(idCol), col("ptid"), col("tid"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val big = dbc.groupBy(col("ptid"), col("tid")).agg(sum(col("c")).as("cb"))
    val uni = big.groupBy(col("ptid")).agg(sum(col("cb")).as("cu"))
    val kV = addK * (topVocab + 1) // +1: the <unk> class
    val model = big.join(uni, Seq("ptid"))
      .select(col("ptid"), col("tid"),
        (-log((col("cb") + lit(addK)) / (col("cu") + lit(kV))))
          .cast("decimal(18,6)").as("__nll"))
    dbc.join(broadcast(model), Seq("ptid", "tid"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"),
        round(sum(col("c") * col("__nll")).cast("double") / sum(col("c")), 6)
          .as("avg_nll"))
  }

  /** Token-distribution KL divergence between two corpus slices — the
    * distribution-drift monitor of a continuously-ingesting training
    * pipeline (is this week's crawl statistically like last week's? is
    * the val split like train?). Add-1 smoothing over the UNION
    * vocabulary so both distributions are supported everywhere and both
    * directions are finite.
    *
    * Shape: one grouped count per side, a full-outer vocab join (shuffle
    * bounded by vocabulary, not corpus), totals as a single broadcast row,
    * then one bounded sum. Per-term contributions go through a
    * decimal(28,20) carrier so the reduction is merge-order invariant;
    * a term is ~p*ln(p/q) (|p*ln ratio| well under 10^7, far inside the
    * carrier's 8 integer digits) and the engines' ln agree to an ulp
    * (~1e-20 absolute at these magnitudes), far below the 6-decimal gate.
    *
    * Returns ONE row: `(n_vocab, n_a, n_b, kl_ab, kl_ba)` (nats). */
  def tokenKlDivergence(a: DataFrame, b: DataFrame,
                        textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame, as: String) = df
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as(as))
    val vocab = counts(a, "ca").join(counts(b, "cb"), Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = vocab.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val pa = (col("ca") + lit(1)).cast("double") /
      (col("na") + col("v")).cast("double")
    val pb = (col("cb") + lit(1)).cast("double") /
      (col("nb") + col("v")).cast("double")
    vocab.crossJoin(broadcast(totals))
      .select(col("v"), col("na"), col("nb"),
        (pa * log(pa / pb)).cast("decimal(28,20)").as("__tab"),
        (pb * log(pb / pa)).cast("decimal(28,20)").as("__tba"))
      .groupBy(col("v"), col("na"), col("nb"))
      .agg(round(sum(col("__tab")).cast("double"), 6).as("kl_ab"),
        round(sum(col("__tba")).cast("double"), 6).as("kl_ba"))
      .select(col("v").as("n_vocab"), col("na").as("n_a"),
        col("nb").as("n_b"), col("kl_ab"), col("kl_ba"))
  }

  /** DuckDB mirror of [[tokenKlDivergence]] with the even/odd doc-id
    * slicing the `quality_kl_drift` gate uses. */
  def klDriftOracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id % 2 AS side,
       |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
       |), vocab AS (
       |  SELECT tok,
       |    SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
       |    SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
       |  FROM toks GROUP BY tok
       |), tot AS (
       |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
       |    COUNT(*) AS v FROM vocab
       |), terms AS (
       |  SELECT v, na, nb,
       |    CAST((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
       |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
       |          / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)))
       |      AS DECIMAL(28,20)) AS tab,
       |    CAST((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
       |      * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
       |          / (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)))
       |      AS DECIMAL(28,20)) AS tba
       |  FROM vocab CROSS JOIN tot
       |)
       |SELECT v AS n_vocab, na AS n_a, nb AS n_b,
       |  ROUND(CAST(SUM(tab) AS DOUBLE), 6) AS kl_ab,
       |  ROUND(CAST(SUM(tba) AS DOUBLE), 6) AS kl_ba
       |FROM terms GROUP BY v, na, nb""".stripMargin

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
