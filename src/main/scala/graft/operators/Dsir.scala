package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, SketchOracleSql}

/** DSIR — Data Selection via Importance Resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a small
  * TARGET domain by scoring each document's hashed n-gram features under
  * a target-vs-raw bag-of-bigrams model. The importance weight of a
  * document is `sum over its bigram occurrences of
  * log p_target(bucket) - log p_raw(bucket)` with add-1 smoothing over a
  * fixed bucket space — the paper's hashed n-gram estimator, which is what
  * makes the model size INDEPENDENT of corpus size. The reference has no
  * analog; this is the corpus-curation step that decides what 100 TB of
  * crawl actually enters training.
  *
  * Scale shape (mirrors [[LangModel.bigramNll]]'s discipline):
  *  - ONE bigram explode pass feeds everything: the per-(doc, bucket)
  *    count aggregate is the only persisted frame (bounded per doc by
  *    min(bigrams, buckets)), and BOTH distributions are rollups of it —
  *    target = the rows whose doc is in the target slice, raw = all rows —
  *    so the corpus token stream is scanned exactly once;
  *  - the fitted model is at most `buckets` rows (256 here) — broadcast
  *    by construction, scoring is a map-side join + one per-doc aggregate;
  *  - selection is `ORDER BY weight LIMIT k` = TakeOrdered (map-side
  *    top-k per partition, k-row reduce) — no global sort, no window over
  *    the corpus.
  *
  * Determinism: bucket ids are FNV-1a64 mod a POWER OF TWO (signed `pmod`
  * == unsigned mod exactly, the [[Sampling.Granularity]] argument); counts
  * are exact integers; each bucket's log-ratio is computed once as the
  * IEEE expression `ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B))` and truncated
  * to a DECIMAL(18,6) carrier, so per-doc sums (count × ratio) are exact
  * and merge-order invariant; ties at the selection boundary break on
  * doc_id. The paper resamples with Gumbel noise; a deterministic variant
  * drops in by perturbing `weight` with a hash-derived Gumbel key
  * ([[Sampling.bucket]] → uniform → -ln(-ln(u))) — selection here is plain
  * top-k so the gate pins the estimator, not the noise. */
object Dsir {

  val Buckets = 256 // power of two — signed pmod == unsigned mod (oracle)

  /** Hashed-bigram importance weights against a target slice, top-k
    * selection: `(doc_id, n_feats, weight)` for the `k` highest-weight
    * documents. `targetFilter` is a SQL boolean over the doc frame's
    * columns defining the target domain. */
  def select(docs: DataFrame, targetFilter: String, k: Int,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"Dsir.select: k must be >= 1, got $k")
    weighted(docs, targetFilter, idCol, textCol)
      .select(col(idCol), col("n_feats"),
        col("__w").cast("double").as("weight"))
      .orderBy(col("weight").desc, col(idCol))
      .limit(k)
  }

  /** The paper's ACTUAL selection step — importance RESAMPLING, not plain
    * top-k (Xie et al. §3): draw `k` documents without replacement with
    * probability ∝ exp(importance weight), via the Gumbel-top-k trick
    * (Kool et al., "Stochastic Beams and Where to Find Them", ICML 2019):
    * top-k of `weight + Gumbel(0)` is exactly such a sample. The Gumbel
    * noise is DETERMINISTIC — `-ln(-ln(u))` with `u` a hash-derived
    * uniform ([[Sampling.bucket]] + ½, over the granularity) — so the
    * sample is a pure function of the data: identical on retry, at any
    * partitioning, and across engines (the rerun-stability contract every
    * sampler in [[Sampling]] carries). Both `ln`s take integer-derived
    * exact-rational inputs and feed no further float arithmetic before
    * the DECIMAL(18,6) truncation — the final-emission-only rule the
    * cross-engine determinism notes require; the selection key
    * `weight + gumbel` is then an EXACT decimal sum. Returns
    * `(doc_id, n_feats, weight, gumbel_key)` ordered by the key. */
  def resample(docs: DataFrame, targetFilter: String, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               seed: String = "gumbel-dsir"): DataFrame = {
    require(k >= 1, s"Dsir.resample: k must be >= 1, got $k")
    val u = (Sampling.bucket(col(idCol), seed).cast("double") + lit(0.5)) /
      lit(Sampling.Granularity.toDouble)
    weighted(docs, targetFilter, idCol, textCol)
      .select(col(idCol), col("n_feats"),
        col("__w").cast("double").as("weight"),
        (col("__w") + (-log(-log(u))).cast("decimal(18,6)"))
          .cast("double").as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** Shared estimator core: `(idCol, n_feats, __w)` with `__w` the exact
    * DECIMAL(18,6) importance weight (sum of count × per-bucket
    * log-ratio). */
  private def weighted(docs: DataFrame, targetFilter: String,
                       idCol: String, textCol: String): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val bigrams = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), expr(targetFilter).as("__tgt"), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), col("__tgt"),
        explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
    // the ONE persisted frame: per-(doc, bucket) occurrence counts; both
    // model distributions and the final scores are rollups/joins of it
    val dbc = bigrams
      .select(col(idCol), col("__tgt"),
        pmod(HashExprs.fnv1a64Col(col("bg")), lit(Buckets.toLong))
          .cast("int").as("bucket"))
      .groupBy(col(idCol), col("__tgt"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = dbc.groupBy(col("bucket")).agg(sum(col("c")).as("cr"))
    val tgt = dbc.filter(col("__tgt"))
      .groupBy(col("bucket")).agg(sum(col("c")).as("ct"))
    // totals as ONE broadcast row — keeps the plan fully lazy (no
    // driver-synchronous action), same shape as LangModel/pagerank
    val totals = dbc.agg(
      sum(col("c")).as("nr"),
      sum(when(col("__tgt"), col("c")).otherwise(lit(0L))).as("nt"))
    val model = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
            (col("nt") + lit(Buckets)).cast("double")) -
          log((col("cr") + lit(1)).cast("double") /
            (col("nr") + lit(Buckets)).cast("double")))
          .cast("decimal(18,6)").as("__lr"))
    dbc.join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      // 6-decimal quantization via the DECIMAL carrier cast, not round():
      // sum(c * __lr) is an EXACT decimal multiple of 1e-6, precisely the
      // decimal-tie case where Spark's round() (re-rounds the double's
      // shortest decimal string, HALF_UP) and DuckDB's ROUND (rounds the
      // binary value) disagree — the measured rule in
      // [[TextClassifier.scoreWith]]'s scaladoc. The carrier cast is
      // value-exact here (the sum is already scale-6), so the final double
      // is bit-identical across engines.
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("__lr")).cast("decimal(18,6)").as("__w"))
  }

  /** DuckDB mirror of [[select]] over the `documents` fixture with the
    * `lang = 'en'` target slice the `corpus_dsir_select` gate uses. */
  def oracleSql(k: Int, buckets: Int = Buckets): String =
    s"""${coreCtes(buckets)}
       |SELECT doc_id, SUM(c) AS n_feats,
       |  CAST(CAST(SUM(c * lr) AS DECIMAL(18,6)) AS DOUBLE) AS weight
       |FROM dbc JOIN model USING (bucket)
       |GROUP BY doc_id
       |ORDER BY weight DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB mirror of [[resample]]: the same estimator, Gumbel-top-k
    * selection key restated bit-for-bit (hash-uniform + two `ln`s +
    * decimal truncation + exact decimal add). */
  def resampleOracleSql(k: Int, buckets: Int = Buckets,
                        seed: String = "gumbel-dsir"): String = {
    val gh = SketchOracleSql.fnvFold(
      s"concat('$seed|', CAST(doc_id AS VARCHAR))")
    s"""${coreCtes(buckets)},
       |sel AS (
       |  SELECT doc_id, SUM(c) AS n_feats,
       |    CAST(SUM(c * lr) AS DECIMAL(18,6)) AS w
       |  FROM dbc JOIN model USING (bucket) GROUP BY doc_id
       |), gum AS (
       |  SELECT doc_id, n_feats, w,
       |    CAST(-ln(-ln((CAST($gh % ${Sampling.Granularity} AS DOUBLE) + 0.5)
       |        / ${Sampling.Granularity}.0))
       |      AS DECIMAL(18,6)) AS g
       |  FROM sel
       |)
       |SELECT doc_id, n_feats, CAST(w AS DOUBLE) AS weight,
       |  CAST(w + g AS DOUBLE) AS gumbel_key
       |FROM gum
       |ORDER BY gumbel_key DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Shared oracle CTE chain: corpus → bigrams → per-(doc,bucket) counts
    * → model log-ratios. */
  private def coreCtes(buckets: Int): String = {
    val bh = SketchOracleSql.fnvFold("bg")
    s"""WITH base AS (
       |  SELECT doc_id, lang = 'en' AS tgt,
       |    string_split_regex(trim(lower(text)), '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
       |), big AS (
       |  SELECT doc_id, tgt, concat(toks[pos], ' ', toks[pos + 1]) AS bg
       |  FROM (
       |    SELECT doc_id, tgt, toks,
       |      CAST(unnest(range(1, len(toks))) AS INTEGER) AS pos
       |    FROM base WHERE len(toks) >= 2)
       |), dbc AS (
       |  SELECT doc_id, tgt, CAST($bh % $buckets AS INTEGER) AS bucket,
       |    COUNT(*) AS c
       |  FROM big GROUP BY doc_id, tgt, bucket
       |), raw AS (
       |  SELECT bucket, SUM(c) AS cr FROM dbc GROUP BY bucket
       |), tgtc AS (
       |  SELECT bucket, SUM(c) AS ct FROM dbc WHERE tgt GROUP BY bucket
       |), tot AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS nr,
       |    CAST(COALESCE(SUM(CASE WHEN tgt THEN c ELSE 0 END), 0) AS BIGINT)
       |      AS nt
       |  FROM dbc
       |), model AS (
       |  SELECT r.bucket,
       |    CAST(ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
       |            / CAST(nt + $buckets AS DOUBLE))
       |       - ln(CAST(r.cr + 1 AS DOUBLE) / CAST(nr + $buckets AS DOUBLE))
       |      AS DECIMAL(18,6)) AS lr
       |  FROM raw r LEFT JOIN tgtc t ON r.bucket = t.bucket CROSS JOIN tot
       |)""".stripMargin
  }
}
