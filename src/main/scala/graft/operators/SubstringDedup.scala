package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact duplicate-SPAN detection — the sub-document complement of
  * whole-document dedup (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022: exact substring matching at corpus
  * scale; there via a monolithic suffix array, here the windowed-
  * fingerprint restatement of the same contract that shards): every
  * `w`-token window occurring in >= 2 distinct documents marks its
  * positions, and overlapping marked windows merge into maximal duplicated
  * spans per document — the regions the paper cuts out of training data.
  *
  * Why not a suffix array: a suffix array is a single global sorted
  * structure (the paper builds it on one machine over the concatenated
  * corpus) — the antithesis of a shardable plan. Fixed-width window
  * fingerprints find exactly the duplicated substrings of length >= `w`
  * tokens (any such substring contains a duplicated `w`-window, and merged
  * windows reconstruct its full extent), and every step is a bounded
  * explode, one hash-shuffle aggregate, and one per-doc window pass —
  * each shape already proven at 100 TB.
  *
  * Scale notes:
  *  - fingerprints are 8-byte `xxhash64` values (codegen'd), so the
  *    duplicate-detection shuffle carries (fp, doc, pos) rows, never
  *    window text; the fingerprint never reaches the output, so the
  *    DuckDB oracle can instead group by the raw window string — same
  *    result up to 64-bit collisions (~n²/2⁶⁵, the usual hash-dedup
  *    caveat; add a verify join where false merges are unacceptable);
  *  - the dup-fingerprint set is data-dependent (can be huge in a
  *    crawl-heavy corpus), so the mark join is a plain shuffle join —
  *    deliberately NOT a broadcast;
  *  - span merge is one per-doc window pass (running max of span ends —
  *    interval merge), a single partition-by-doc shuffle. */
object SubstringDedup {

  /** Maximal cross-document duplicated spans:
    * `(doc_id, span_start, span_end, n_windows)` — token positions are
    * 0-based, `span_end` inclusive, `n_windows` = marked `w`-windows
    * merged into the span. Documents shorter than `w` tokens carry no
    * windows and are absent by construction. */
  def duplicateSpans(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", w: Int = 10): DataFrame = {
    require(w >= 2, s"window must cover >= 2 tokens (got $w)")
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= w)
    // one row per window start; the w-token slice re-joined with a single
    // space is injective on the token sequence (tokens are whitespace-split
    // so they contain none), then folded to an 8-byte fingerprint
    val wins = toks.select(col(idCol),
        posexplode(transform(sequence(lit(0), size(col("toks")) - w),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(w))))))
          .as(Seq("pos", "fp")))
      // feeds both the dup-fp aggregate and the mark join — without the
      // persist the tokenize+hash explode runs twice (released by the
      // ContextCleaner once the returned plan is unreferenced)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dupFps = wins.groupBy(col("fp"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("fp"))
    val marked = wins.join(dupFps, Seq("fp"))
      .select(col(idCol), col("pos"))
    // interval merge: a marked window starts a NEW span iff its start lies
    // beyond every previous marked window's end (running max over prior
    // ends); the flag's running sum is the span id. Start-consecutiveness
    // alone would split overlapping-but-nonadjacent windows (pos 0 and 5
    // at w=10 overlap) into separate spans.
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(w - 1)).over(
      byPos.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("__new", when(
        prevEnd.isNull || col("pos") > prevEnd, 1).otherwise(0))
      .withColumn("__span", sum(col("__new")).over(byPos))
      .groupBy(col(idCol), col("__span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** DuckDB mirror of [[duplicateSpans]] over the planted near-dup corpus
    * (originals plus `data`->`info` perturbed copies — the same corpus the
    * dedup_* gates use, restated without the ASCII guard because this
    * oracle groups raw window STRINGS, not FNV byte-folds). */
  def duplicateSpansOracleSql(w: Int = 10): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id,
       |    regexp_replace(text, '\\bdata\\b', 'info', 'g') AS text
       |  FROM documents
       |), toksd AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
       |  FROM corpus WHERE text IS NOT NULL AND trim(text) <> ''
       |), wins AS (
       |  SELECT doc_id, pos,
       |    array_to_string(list_slice(toks, pos + 1, pos + $w), ' ') AS fp
       |  FROM (
       |    SELECT doc_id, toks,
       |      CAST(unnest(range(0, len(toks) - $w + 1)) AS INTEGER) AS pos
       |    FROM toksd WHERE len(toks) >= $w)
       |), dup AS (
       |  SELECT fp FROM wins GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
       |), marked AS (
       |  SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (fp)
       |), flagged AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN MAX(pos + $w - 1) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR pos > MAX(pos + $w - 1) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS is_new
       |  FROM marked
       |), spans AS (
       |  SELECT doc_id, pos,
       |    SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS span
       |  FROM flagged
       |)
       |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + $w - 1 AS span_end,
       |  COUNT(*) AS n_windows
       |FROM spans GROUP BY doc_id, span
       |ORDER BY doc_id, span_start""".stripMargin
}
