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

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: a GPT2-style pre-tokenizer regex (letters /
    * digits / punctuation runs with optional leading space). An upper bound
    * proxy for LLM token cost without shipping a merges table. */
  val bpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(bpePattern), lit(0)))

  /** Quality-scoring signals (length / punctuation / stopword / diversity
    * ratios) used to filter low-quality documents. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[^a-z0-9\\s]"), lit(0)))
  def digitCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[0-9]"), lit(0)))
  def uniqueTokenRatio(c: Column): Column =
    size(array_distinct(tokens(c))).cast(DoubleType) / size(tokens(c))
  def meanTokenLen(c: Column): Column =
    length(regexp_replace(trim(c), "\\s+", "")).cast(DoubleType) / size(tokens(c))

  /** Stopword tables for the language-ID heuristic (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"))

  def stopwordCount(c: Column, lang: String): Column =
    size(regexp_extract_all(lower(c),
      lit("\\b(" + stopwords(lang).mkString("|") + ")\\b"), lit(0)))

  def stopwordRatio(c: Column, lang: String = "en"): Column =
    stopwordCount(c, lang).cast(DoubleType) / tokenCount(c)

  /** Language-ID heuristic: CJK charset probe first, then argmax of stopword
    * hits with a fixed tie-break order (en > de > fr > es), 'und' (undefined)
    * when no stopword matches at all. */
  def langId(c: Column): Column = {
    val scores = Seq("en", "de", "fr", "es").map(l => l -> stopwordCount(c, l))
    val best = greatest(scores.map(_._2): _*)
    // fold from the last language so earlier languages win ties
    val ordered = scores.reverse.foldLeft(lit("und")) { case (alt, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(alt)
    }
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(ordered)
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
