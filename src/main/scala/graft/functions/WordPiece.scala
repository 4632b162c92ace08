package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenization — greedy longest-match-first ("MaxMatch")
  * segmentation against a fixed vocabulary of word-start pieces and `##`
  * continuation pieces (Wu et al., "Google's Neural Machine Translation
  * System", 2016; the BERT tokenizer). Completes the tokenizer trio next
  * to BPE ([[Bpe]], merge-table application + distributed training) and
  * the unigram LM ([[graft.operators.Unigram]], hard-EM Viterbi).
  *
  * Algorithm: at each position take the LONGEST vocab piece matching the
  * remaining word (start pieces at position 1, continuation pieces after),
  * emit it, advance. Every single character is in both vocab tiers, so
  * segmentation is total (no UNK on the fixture's a–z charset; an
  * out-of-vocab char falls back to a one-char piece deterministically).
  *
  * Plan shape: segmentation runs over DISTINCT words only — the fold costs
  * |vocabulary of the corpus|, not |corpus| — then piece counts come from
  * joining word frequencies back (broadcast-sized by Heaps'-law contract).
  * The per-word fold is a bounded `aggregate` over built-in expressions
  * (each step consumes >= 1 char, so `length(word)` steps suffice): no
  * UDF, and the identical bounded iteration restates as a DuckDB recursive
  * CTE, which is what lets the oracle verify greedy MaxMatch exactly.
  *
  * Vocabulary: hand-written for the fixture corpus, like [[Bpe.merges]] —
  * the gate proves the machinery; a trained vocab (e.g. BERT's 30k) drops
  * in as data. Pieces are bucketed by exact length so a truncated
  * end-of-word substring can never false-match a longer piece.
  */
object WordPiece {

  val maxPieceLen = 5

  private val chars: Seq[String] = ('a' to 'z').map(_.toString)

  /** Word-START pieces, bucketed by exact length. */
  val startVocab: Map[Int, Seq[String]] = Map(
    5 -> Seq("spark", "value", "small", "batch", "query"),
    4 -> Seq("wind", "tabl", "stre", "cust", "colu", "merg", "filt",
      "sort", "orde", "grou"),
    3 -> Seq("val", "sca", "slo", "lin", "par", "fas", "has", "the",
      "key", "agg", "row", "joi", "big", "dup"),
    2 -> Seq("qu", "gr", "ba", "sl", "fa", "jo", "fi", "me", "ha", "so",
      "li", "pa", "ro", "ag", "ke", "da", "sm", "ve", "du", "wi", "ta",
      "co", "st", "cu", "or", "bi", "th", "sp"),
    1 -> chars)

  /** CONTINUATION pieces (emitted with a `##` prefix), by exact length. */
  val contVocab: Map[Int, Seq[String]] = Map(
    5 -> Seq("tomer"),
    4 -> Seq("omer", "ream", "ndow", "lumn", "ctor"),
    3 -> Seq("ble", "der", "oup", "ery", "tch", "ine", "art", "ast",
      "ash", "low"),
    2 -> Seq("le", "ow", "er", "ue", "am", "in", "rt", "st", "sh", "ta",
      "ey", "gg", "ig", "up", "an", "ch", "rk", "ge"),
    1 -> chars)

  /** Greedy MaxMatch of one word -> array of pieces (continuations
    * `##`-prefixed). Bounded fold: `length(word)` steps, each a no-op once
    * the cursor passes the end. */
  def segment(word: Column): Column = {
    val init = struct(lit(1).as("pos"),
      array().cast("array<string>").as("toks"))
    val folded = aggregate(
      sequence(lit(1), greatest(length(word), lit(1))),
      init,
      (st: Column, _: Column) => {
        val pos = st.getField("pos")
        val isStart = pos === 1
        def sub(l: Int) = word.substr(pos, lit(l))
        // build innermost-out: the LAST fold step wraps with the longest
        // piece length, so longest-first wins at evaluation time
        val matchLen = (2 to maxPieceLen).foldLeft(lit(1)) { (acc, l) =>
          when(isStart && sub(l).isin(startVocab(l): _*), l)
            .when(!isStart && sub(l).isin(contVocab(l): _*), l)
            .otherwise(acc)
        }
        val raw = word.substr(pos, matchLen)
        val piece = when(isStart, raw).otherwise(concat(lit("##"), raw))
        when(pos > length(word), st)
          .otherwise(struct((pos + matchLen).as("pos"),
            concat(st.getField("toks"), array(piece)).as("toks")))
      },
      st => st.getField("toks"))
    folded
  }

  /** Corpus piece frequencies, top `k` by (count DESC, piece): whitespace
    * words -> counts; DISTINCT words segmented once; counts joined back. */
  def pieceCounts(docs: DataFrame, textCol: String = "text",
                  k: Int = 40): DataFrame = {
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n_word"))
    words
      .withColumn("piece", explode(segment(col("word"))))
      .groupBy(col("piece"))
      .agg(sum(col("n_word")).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(k)
  }

  // ---------------------------------------------------------------- oracle

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** DuckDB restatement of [[pieceCounts]] over `documents`: the same
    * greedy MaxMatch as a recursive CTE over distinct words — one row per
    * (word, cursor) state, CASE chain longest-first, single-char ELSE. */
  def pieceCountsOracleSql(k: Int = 40): String = {
    def arm(l: Int, start: Boolean): String = {
      val vocab = if (start) startVocab(l) else contVocab(l)
      val side = if (start) "pos = 1" else "pos > 1"
      s"WHEN $side AND list_contains(${sqlList(vocab)}, substr(w, pos, $l)) THEN $l"
    }
    val lenCase = ((maxPieceLen to 2 by -1).flatMap(l =>
      Seq(arm(l, start = true), arm(l, start = false))) :+ "ELSE 1")
      .mkString("CASE ", " ", " END")
    s"""WITH RECURSIVE words AS (
       |  SELECT w, COUNT(*) AS n_word FROM (
       |    SELECT unnest(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w
       |    FROM documents WHERE text IS NOT NULL
       |  ) WHERE w <> '' GROUP BY w
       |), seg AS (
       |  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks FROM words
       |  UNION ALL
       |  SELECT w, pos + L AS pos,
       |    list_append(toks, CASE WHEN pos = 1 THEN substr(w, pos, L)
       |                           ELSE '##' || substr(w, pos, L) END) AS toks
       |  FROM (
       |    SELECT w, pos, toks, $lenCase AS L
       |    FROM seg WHERE pos <= length(w)
       |  )
       |), done AS (
       |  SELECT w, toks FROM seg WHERE pos > length(w)
       |)
       |SELECT piece, CAST(SUM(n_word) AS BIGINT) AS n
       |FROM (SELECT w, unnest(toks) AS piece FROM done)
       |JOIN words USING (w)
       |GROUP BY piece ORDER BY n DESC, piece LIMIT $k""".stripMargin
  }
}
