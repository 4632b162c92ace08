package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedLog

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
    // idf = ln(1 + (N-df+0.5)/(df+0.5)) = ln(2(N+1)) - ln(2df+1): two
    // INTEGER logs, so it goes through [[graft.functions.FixedLog]] and is
    // quantized to an exact DECIMAL(18,6) on the ONE-ROW stats frame (zero
    // per-doc cost) — a libm-ulp idf difference between engine builds
    // would otherwise shift every score. The remaining score arithmetic is
    // correctly-rounded IEEE ops on bit-identical inputs.
    var st = stats.withColumn("__n2", (col("n_docs") + lit(1L)) * lit(2L))
    st = FixedLog.withLn(st, "__n2", "__lnn2")
    for (t <- terms) {
      st = FixedLog.withLn(
        st.withColumn(s"__d2_$t", col(s"df_$t") * lit(2L) + lit(1L)),
        s"__d2_$t", s"__lnd_$t")
      st = FixedLog.withS12ToDec6(
        st.withColumn(s"__idf12_$t", col("__lnn2") - col(s"__lnd_$t")),
        s"__idf12_$t", s"__idf_$t")
    }
    val statsIdf = st.select(col("n_docs") +: col("__sum_dl") +:
      terms.map(t => col(s"__idf_$t")): _*)
    // fixed left-to-right term order keeps double summation bit-identical
    // to the oracle's restatement of the same expression
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val idf = col(s"__idf_$t").cast("double")
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    base.crossJoin(broadcast(statsIdf))
      .withColumn("avgdl", col("__sum_dl").cast("double") / col("n_docs"))
      .withColumn("__score", terms.map(termScore).reduce(_ + _))
      .orderBy(col("__score").desc, col(idCol))
      .limit(k)
      .select(Seq(col(idCol), col("dl")) ++ terms.map(t => col(s"tf_$t")) :+
        round(col("__score"), 6).as("score_r"): _*)
  }

  /** DuckDB restatement of [[bm25TopK]] for the oracle gate.
    * `preludeCtes` (optional, `name AS (...), ...` text) is prepended to
    * the WITH chain so `table` can be a derived relation — the chunk-level
    * retrieval gate feeds a chunked CTE in as the corpus. */
  def bm25OracleSql(idCol: String, textCol: String, table: String,
                    terms: Seq[String], k: Int = 20,
                    k1: Double = 1.2, b: Double = 0.75,
                    preludeCtes: String = ""): String = {
    val prelude = if (preludeCtes.isEmpty) "" else preludeCtes + ",\n"
    val toks = s"string_split_regex(trim(lower($textCol)), '[ \\t\\n\\x0B\\f\\r]+')"
    val tfCols = terms.map(t =>
      s"len(list_filter($toks, x -> x = '$t')) AS tf_$t").mkString(",\n    ")
    val dfCols = terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n    ")
    val score = terms.map { t =>
      s"""CAST(__idf_$t AS DOUBLE)
         | * CAST(tf_$t AS DOUBLE) * ${k1 + 1.0}
         | / (CAST(tf_$t AS DOUBLE) + $k1 * (${1.0 - b} + $b * dl / avgdl))"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(" + ")
    val lnItems = (graft.functions.FixedLog.duckLnItems(
      "2 * (n_docs + 1)", "__lnn2") ++
      terms.flatMap(t => graft.functions.FixedLog.duckLnItems(
        s"2 * df_$t + 1", s"__lnd_$t"))).mkString(",\n    ")
    val idfItems = terms.map(t =>
      s"${graft.functions.FixedLog.duckS12ToDec6(s"(__lnn2 - __lnd_$t)")} " +
        s"AS __idf_$t").mkString(",\n    ")
    val tfSel = terms.map(t => s"tf_$t").mkString(", ")
    s"""WITH ${prelude}base AS (
       |  SELECT $idCol, len($toks) AS dl,
       |    $tfCols
       |  FROM $table
       |  WHERE $textCol IS NOT NULL AND trim($textCol) <> ''
       |), stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS avgdl,
       |    $dfCols
       |  FROM base
       |), statsL AS (
       |  SELECT stats.*,
       |    $lnItems
       |  FROM stats
       |), statsI AS (
       |  SELECT statsL.*,
       |    $idfItems
       |  FROM statsL
       |)
       |SELECT $idCol, dl, $tfSel, ROUND(score, 6) AS score_r
       |FROM (SELECT base.*, $score AS score FROM base, statsI)
       |ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods", SIGIR 2009) — the standard hybrid-retrieval merge of a
    * lexical (BM25) and a semantic (ANN) ranking: each list contributes
    * `1/(c + rank)` and the fused top-k is ordered by the sum. Items in
    * only one list keep that list's contribution (the full-outer
    * semantics production RAG stacks use). Pure rank arithmetic on
    * IEEE-identical integers — engine-exact by construction; the join is
    * over two TOP-K frames, broadcast-sized at any corpus scale.
    *
    * Input frames must carry (`idCol`, `rankCol`); output:
    * `(idCol, <rankColA>, <rankColB>, rrf)` top-k by fused score. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankColA: String, rankColB: String, k: Int,
              c: Int = 60): DataFrame = {
    require(k >= 1 && c >= 0, "rrfFuse: k >= 1, c >= 0")
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col(rankColA)), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col(rankColB)), lit(0.0)))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB mirror of the `text_hybrid_rrf` gate: [[bm25OracleSql]]'s
    * top-20 re-ranked on the rounded score, the single-query cosine
    * top-20, full-outer RRF fusion. */
  def hybridRrfOracleSql(terms: Seq[String], kLists: Int = 20,
                         k: Int = 10, c: Int = 60): String = {
    val bm25 = bm25OracleSql("doc_id", "text", "documents", terms, kLists)
    val cos = graft.functions.VectorOracleSql.cosine("e.embedding", "q.q_emb")
    s"""WITH lex AS (
       |  SELECT doc_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY score_r DESC, doc_id)
       |      AS INTEGER) AS lex_rank
       |  FROM ($bm25)
       |), q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |sem_scored AS (
       |  SELECT e.vec_id AS doc_id, $cos AS score
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
       |), sem AS (
       |  SELECT doc_id, sem_rank FROM (
       |    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC,
       |      doc_id) AS INTEGER) AS sem_rank
       |    FROM sem_scored) WHERE sem_rank <= $kLists
       |)
       |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, lex_rank, sem_rank,
       |  COALESCE(1.0 / ($c + lex_rank), 0)
       |    + COALESCE(1.0 / ($c + sem_rank), 0) AS rrf
       |FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Top-`k` bigram collocations by pointwise mutual information (Church &
    * Hanks, "Word Association Norms, Mutual Information, and
    * Lexicography", Computational Linguistics 1990) — the corpus-analysis
    * primitive behind multiword-expression vocabularies (BPE/unigram
    * tokenizers pick these up implicitly; PMI surfaces them explicitly for
    * vocabulary audits and stop-phrase lists).
    *
    * `pmi(w1, w2) = ln(c(w1 w2) * N / (c(w1) * c(w2)))` over bigram
    * occurrences, with a `minCount` support floor (PMI is notoriously
    * noisy on hapax pairs — the floor is Church & Hanks' own remedy).
    *
    * Scale shape: one token explode feeds the unigram count, one bigram
    * explode (narrow zip_with, no window) feeds the pair count; both are
    * word-keyed shuffle aggregates bounded by VOCABULARY, not corpus; the
    * pair-to-unigram joins are word-keyed joins between those bounded
    * frames; the total is one broadcast row; the top-k is TakeOrdered.
    * Counts are exact integers; the score is four [[FixedLog]] integer
    * logs quantized to 6 decimals by integer rounding, and the ORDER is on
    * that quantized value with (w1, w2) tie-break — engine-exact by
    * construction (no libm in the path). */
  def collocationsTopK(docs: DataFrame, idCol: String, textCol: String,
                       minCount: Int = 5, k: Int = 30): DataFrame = {
    require(minCount >= 1 && k >= 1, "collocationsTopK: minCount, k >= 1")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    def base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(toks.as("__toks"))
    val uni = base.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val pairs = base.filter(size(col("__toks")) >= 2)
      .select(explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val pc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minCount)
    val total = pairs.agg(count(lit(1)).as("n_pairs"))
    // pmi = ln(c12·N/(c1·c2)) decomposed into FOUR integer logs (no
    // products, so no overflow at any corpus scale) through [[FixedLog]]:
    // the ORDER is on the quantized value, so a libm-ulp flip would
    // reorder the top-k, not just blur a decimal.
    val joined = pc
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
    val logs = Seq("c_pair" -> "__lcp", "n_pairs" -> "__lnp",
      "c1" -> "__lc1", "c2" -> "__lc2")
      .foldLeft(joined) { case (d, (in, out)) => FixedLog.withLn(d, in, out) }
      .withColumn("__pmi12",
        col("__lcp") + col("__lnp") - col("__lc1") - col("__lc2"))
    FixedLog.withS12ToDec6(logs, "__pmi12", "__pmiq")
      .select(col("w1"), col("w2"), col("c_pair"), col("c1"), col("c2"),
        col("__pmiq").cast("double").as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** DuckDB restatement of [[collocationsTopK]] for the oracle gate. */
  def collocationsOracleSql(idCol: String, textCol: String, table: String,
                            minCount: Int = 5, k: Int = 30): String = {
    val toks = s"string_split_regex(trim(lower($textCol)), '[ \\t\\n\\x0B\\f\\r]+')"
    s"""WITH base AS (
       |  SELECT $toks AS toks FROM $table
       |  WHERE $textCol IS NOT NULL AND trim($textCol) <> ''
       |), uni AS (
       |  SELECT w, COUNT(*) AS cw FROM (
       |    SELECT unnest(toks) AS w FROM base) GROUP BY w
       |), pairs AS (
       |  SELECT toks[pos] AS w1, toks[pos + 1] AS w2 FROM (
       |    SELECT toks, CAST(unnest(range(1, len(toks))) AS INTEGER) AS pos
       |    FROM base WHERE len(toks) >= 2)
       |), pc AS (
       |  SELECT w1, w2, COUNT(*) AS c_pair FROM pairs GROUP BY w1, w2
       |  HAVING COUNT(*) >= $minCount
       |), tot AS (SELECT COUNT(*) AS n_pairs FROM pairs)
       |SELECT w1, w2, c_pair, c1, c2,
       |  CAST(${FixedLog.duckS12ToDec6("__pmi12")} AS DOUBLE) AS pmi
       |FROM (
       |  SELECT p.w1, p.w2, p.c_pair, u1.cw AS c1, u2.cw AS c2,
       |    ${FixedLog.duckLnItems("p.c_pair", "__lcp").mkString(",\n    ")},
       |    ${FixedLog.duckLnItems("n_pairs", "__lnp").mkString(",\n    ")},
       |    ${FixedLog.duckLnItems("u1.cw", "__lc1").mkString(",\n    ")},
       |    ${FixedLog.duckLnItems("u2.cw", "__lc2").mkString(",\n    ")},
       |    __lcp + __lnp - __lc1 - __lc2 AS __pmi12
       |  FROM pc p
       |  JOIN uni u1 ON p.w1 = u1.w
       |  JOIN uni u2 ON p.w2 = u2.w
       |  CROSS JOIN tot)
       |ORDER BY pmi DESC, w1, w2 LIMIT $k""".stripMargin
  }
}
