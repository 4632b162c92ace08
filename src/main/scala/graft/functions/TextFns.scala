package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * built-in expression compositions (codegen-friendly, no UDFs) — each is a
  * narrow per-row transformation that scales embarrassingly at 100 TB.
  */
object TextFns {

  /** Whitespace tokens of cleaned text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** NULL-propagating array size: with ANSI off, `size(NULL)` is -1, which
    * would leak -1 counts (and -1/-1 = 1.0 ratios) for NULL documents where
    * the DuckDB oracle yields NULL. */
  private def sizeOrNull(arr: Column): Column = when(arr.isNotNull, size(arr))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = sizeOrNull(tokens(c))

  /** BPE-ish subword count: a GPT2-style pre-tokenizer regex (letters /
    * digits / punctuation runs with optional leading space). An upper bound
    * proxy for LLM token cost without shipping a merges table. */
  val bpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
  def bpeishCount(c: Column): Column =
    sizeOrNull(regexp_extract_all(lower(c), lit(bpePattern), lit(0)))

  /** Quality-scoring signals (length / punctuation / stopword / diversity
    * ratios) used to filter low-quality documents. */
  def punctCount(c: Column): Column =
    sizeOrNull(regexp_extract_all(lower(c), lit("[^a-z0-9\\s]"), lit(0)))
  def digitCount(c: Column): Column =
    sizeOrNull(regexp_extract_all(c, lit("[0-9]"), lit(0)))
  def uniqueTokenRatio(c: Column): Column =
    sizeOrNull(array_distinct(tokens(c))).cast(DoubleType) / tokenCount(c)
  def meanTokenLen(c: Column): Column =
    length(regexp_replace(trim(c), "\\s+", "")).cast(DoubleType) / tokenCount(c)

  /** Stopword tables for the language-ID heuristic (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"))

  def stopwordCount(c: Column, lang: String): Column =
    sizeOrNull(regexp_extract_all(lower(c),
      lit("\\b(" + stopwords(lang).mkString("|") + ")\\b"), lit(0)))

  def stopwordRatio(c: Column, lang: String = "en"): Column =
    stopwordCount(c, lang).cast(DoubleType) / tokenCount(c)

  /** Language-ID heuristic: CJK charset probe first, then argmax of stopword
    * hits with a fixed tie-break order (en > de > fr > es), 'und' (undefined)
    * when no stopword matches at all.
    *
    * ONE regex pass extracts every stopword of every language; per-language
    * scores are then cheap array filters over the match list. With 4
    * languages this ties the per-language-regex formulation (alternation
    * width trades against scan count), but scan count no longer grows with
    * the language set. */
  def langId(c: Column): Column = {
    val langs = Seq("en", "de", "fr", "es")
    val allWords = langs.flatMap(stopwords).distinct
    val hits = regexp_extract_all(lower(c),
      lit("\\b(" + allWords.mkString("|") + ")\\b"), lit(0))
    val scores = langs.map { l =>
      l -> size(filter(hits, x => x.isin(stopwords(l): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    // fold from the last language so earlier languages win ties
    val ordered = scores.reverse.foldLeft(lit("und")) { case (alt, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(alt)
    }
    when(c.isNull, lit(null))
      .when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .otherwise(ordered)
  }

  /** Document fingerprint: rolling polynomial hash of the character stream,
    * mod 1e9+7 (stays in Long range; identical arithmetic is expressible in
    * the DuckDB oracle). Whitespace-insensitive via pre-cleaning. */
  def fingerprint(c: Column): Column = {
    val codes = transform(split(Fns.cleanText(c), ""), ch => ascii(ch).cast(LongType))
    aggregate(codes, lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)
  }

  /** Distinct word n-gram shingles: contiguous n-token windows joined by a
    * single space; empty when fewer than n tokens (native expression). */
  def wordShingles(c: Column, n: Int): Column =
    TextExprs.wordShingles(tokens(c), n)
}
