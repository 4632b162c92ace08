package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashExprs

/** Content-defined chunking (CDC) — variable-size chunk boundaries chosen
  * by the CONTENT of a small sliding window, so an insertion or deletion
  * re-synchronizes after at most one window instead of shifting every
  * downstream chunk the way fixed-size chunking does. This is the dedup
  * granularity of LBFS (Muthitacharoen et al., SOSP 2001) and FastCDC
  * (Xia et al., USENIX ATC 2016): a position `p` ends a chunk iff
  * `hash(text[p-w+1 .. p]) mod d == 0`, giving expected chunk size `d`.
  *
  * Honest divergence from FastCDC: the boundary hash here is a full FNV-1a64
  * fold of the w-char window (O(w) per position) rather than an O(1)
  * incremental Gear/Rabin rolling update, because the FNV fold restates
  * bit-for-bit in the DuckDB oracle ([[graft.functions.SketchOracleSql.fnvFold]]).
  * The boundary DECISION depends only on the local window either way — the
  * content-defined semantics (and the resync property the spec pins) are
  * identical; a native engine swaps in the Gear table without changing any
  * downstream plan. FastCDC's min/max chunk clamps are likewise parameters,
  * not structure, and are omitted.
  *
  * Plan shape: boundary detection is ONE native expression pass over the
  * document's bytes (zero per-window allocation — [[CdcBoundaries]]; the
  * composed higher-order twin [[boundariesBuiltin]] is retained as the
  * oracle-restatable reference and spec-pinned equal), slicing is narrow
  * built-in zip_with — no UDF, no shuffle; chunking 100 TB is scan-bound.
  * The first-occurrence dedup then shuffles 16-byte digests + lengths
  * once (never chunk text twice), exactly like the fixed-chunk
  * `dedup_chunks` gate.
  */
object CdcChunk {

  /** Native single-pass boundary finder: every position p in [w, L-1]
    * whose trailing w-char window FNV-hashes to 0 under the low-bits mask
    * — the whole scan walks the document's UTF-8 bytes ONCE with zero
    * per-window allocation (the composed higher-order twin below
    * materializes a substring per position, ~O(L) short-lived strings per
    * document; same math, kept as the oracle-restatable reference — the
    * Bpe native/builtin pairing). Non-ASCII docs fall back to char-window
    * substrings so positions stay CHARACTER offsets, matching the
    * slicing. */
  private[graft] case class CdcBoundaries(child: Expression, w: Int,
                                              d: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdcBoundaries expects string, got $other")
    }
    override def nullSafeEval(input: Any): Any =
      boundariesOf(input.asInstanceOf[UTF8String], w, d)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev,
        c => s"graft.operators.CdcChunk.boundariesOf($c, $w, $d)")
    override protected def withNewChildInternal(c: Expression): CdcBoundaries =
      copy(child = c)
  }

  /** Static twin for generated code: [[CdcBoundaries]]'s single-pass
    * rolling-window scan. */
  final def boundariesOf(s: UTF8String, w: Int, d: Int): GenericArrayData = {
    val nChars = s.numChars()
    val mask = (d - 1).toLong
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val bytes = s.getBytes
    if (bytes.length == nChars) {
      // pure ASCII: byte offsets == char positions; windows are views
      // into the shared array, never copied
      var p = w
      while (p <= nChars - 1) {
        var h = 0xcbf29ce484222325L
        var i = p - w
        while (i < p) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        if ((h & mask) == 0L) out += p
        p += 1
      }
    } else {
      // multi-byte chars: per-window char substring (correctness path)
      var p = w
      while (p <= nChars - 1) {
        val h = HashExprs.fnv1a64(s.substring(p - w, p).getBytes)
        if ((h & mask) == 0L) out += p
        p += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  private[graft] def cdcBoundaries(c: Column, w: Int, d: Int): Column =
    GraftGlue.toColumn(CdcBoundaries(GraftGlue.toExpression(c), w, d))

  /** The composed built-in twin of [[CdcBoundaries]] — identical output by
    * construction (spec-pinned); restates directly in the DuckDB oracle. */
  private[graft] def boundariesBuiltin(txt: Column, w: Int,
                                           d: Int): Column = {
    val len = length(txt)
    filter(
      when(len - 1 >= w, sequence(lit(w), len - 1))
        .otherwise(array().cast(ArrayType(IntegerType))),
      p => HashExprs.fnv1a64Col(txt.substr(p - lit(w - 1), lit(w)))
        .bitwiseAND(lit((d - 1).toLong)) === 0)
  }

  /** Per-document chunk rows: (idCol, chunk_idx, chunk). `d` must be a
    * power of two — the boundary test is a low-bits mask, which is
    * identical arithmetic on a signed 64-bit hash (Spark) and the unsigned
    * HUGEINT restatement (DuckDB). NULL-text rows produce no chunks. */
  def chunked(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", w: Int = 8, d: Int = 32): DataFrame = {
    require(d > 0 && (d & (d - 1)) == 0, s"d must be a power of two, got $d")
    require(w >= 2, s"window must be >= 2 chars, got $w")
    val txt = col(textCol)
    val len = length(txt)
    // boundary positions p in [w, len-1]: cut AFTER p; the last position is
    // excluded so no zero-length tail chunk can form
    val bnds = cdcBoundaries(txt, w, d)
    val starts = concat(array(lit(1)), transform(bnds, b => b + 1))
    val ends = concat(bnds, array(len))
    val chunks = zip_with(starts, ends,
      (s: Column, e: Column) => txt.substr(s, e - s + 1))
    docs.filter(txt.isNotNull)
      .select(col(idCol), posexplode(chunks).as(Seq("__i", "chunk")))
      .select(col(idCol), (col("__i") + 1).as("chunk_idx"), col("chunk"))
  }

  /** First-occurrence-wins chunk dedup, reported per document:
    * (idCol, n_chunks, n_kept, chars_kept). Global order is
    * (idCol, chunk_idx) per chunk digest — one hash-partitioned window
    * carrying digests and lengths only. */
  def dedupStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", w: Int = 8,
                 d: Int = 32): DataFrame = {
    val ch = chunked(docs, idCol, textCol, w, d)
      .select(col(idCol), col("chunk_idx"),
        md5(col("chunk")).as("__h"), length(col("chunk")).as("__len"))
    val win = Window.partitionBy(col("__h"))
      .orderBy(col(idCol), col("chunk_idx"))
    ch.withColumn("__rk", row_number().over(win))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__rk") === 1, col("__len").cast("long"))
          .otherwise(0L)).as("chars_kept"))
  }

  /** Content-addressed chunk STORE round trip — the architecture CDC
    * boundaries exist to serve (LBFS, backup/dedup systems): per-doc
    * recipes `(id, chunk_idx, hash)` plus the DEDUPLICATED `(hash, chunk)`
    * store are written to parquet, read back, and every document is
    * reassembled from store chunks in recipe order. Output
    * `(idCol, n_chunks, match)` — a digest collision or lost chunk flips
    * `match` false. The store write's only shuffle is the digest
    * dropDuplicates; reconstruction is one hash join + an ordered
    * per-doc fold. At scale the store is the small side (dedup is the
    * point) and recipes stream. */
  def storeRoundTrip(docs: DataFrame, dir: String, idCol: String = "doc_id",
                     textCol: String = "text", w: Int = 8,
                     d: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val ch = chunked(docs, idCol, textCol, w, d)
      .select(col(idCol), col("chunk_idx"), col("chunk"),
        md5(col("chunk")).as("h"))
    ch.select(col(idCol), col("chunk_idx"), col("h"))
      .write.mode("overwrite").parquet(s"$dir/recipes")
    ch.select(col("h"), col("chunk")).dropDuplicates("h")
      .write.mode("overwrite").parquet(s"$dir/store")
    val recipes = spark.read.parquet(s"$dir/recipes")
    val store = spark.read.parquet(s"$dir/store")
    recipes.join(store, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), "").as("__rebuilt"))
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col("n_chunks"),
        (col("__rebuilt") === col(textCol)).as("match"))
      .orderBy(col(idCol))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB restatement of [[dedupStats]] over the `documents` table —
    * same FNV window fold, mask, slicing, and first-occurrence window.
    * ASCII-guarded like the other text oracles: the SQL fold walks code
    * points, the engine hashes UTF-8 bytes. */
  def dedupStatsOracleSql(w: Int = 8, d: Int = 32): String =
    s"""WITH ${chunkCtes(w, d)}, rk AS (
       |  SELECT doc_id, len,
       |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rk
       |  FROM ch
       |)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN rk = 1 THEN len ELSE 0 END) AS BIGINT) AS chars_kept
       |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB restatement of the content-addressed store round trip: the
    * same chunk rows, reassembled per document in chunk order through the
    * (hash -> chunk) association — if any digest collided or any chunk
    * were lost, `match` flips false. */
  def storeRoundTripOracleSql(w: Int = 8, d: Int = 32): String =
    s"""WITH ${chunkCtes(w, d)}, recon AS (
       |  SELECT doc_id, COUNT(*) AS n_chunks,
       |    string_agg(chunk, '' ORDER BY chunk_idx) AS rebuilt
       |  FROM ch GROUP BY doc_id
       |)
       |SELECT r.doc_id, r.n_chunks, (r.rebuilt = d.text) AS match
       |FROM recon r JOIN docs d USING (doc_id)
       |ORDER BY r.doc_id""".stripMargin

  /** Shared chunk CTE chain (no leading WITH): ASCII-guarded `docs`, then
    * `ch(doc_id, chunk_idx, chunk, h, len)` — one row per CDC chunk. */
  private def chunkCtes(w: Int, d: Int): String = {
    import graft.functions.SketchOracleSql.fnvFold
    s"""docs_raw AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |ascii_guard AS (
       |  SELECT CASE WHEN EXISTS (SELECT 1 FROM docs_raw
       |      WHERE octet_length(encode(text)) <> length(text))
       |    THEN error('non-ASCII document: the FNV byte-fold oracle restatement is ASCII-only')
       |    ELSE NULL END AS chk
       |), docs AS (
       |  SELECT docs_raw.* FROM docs_raw CROSS JOIN ascii_guard WHERE ascii_guard.chk IS NULL
       |), b AS (
       |  SELECT doc_id, text, length(text) AS L,
       |    list_filter(range($w, length(text)),
       |      p -> (${fnvFold(s"substr(text, p - ${w - 1}, $w)")}) % $d = 0) AS bnds
       |  FROM docs
       |), seg AS (
       |  SELECT doc_id, text, L,
       |    list_prepend(1, list_transform(bnds, x -> x + 1)) AS starts,
       |    list_append(bnds, CAST(L AS BIGINT)) AS ends
       |  FROM b
       |), ch AS (
       |  SELECT doc_id, r.u['i'] AS chunk_idx, r.u['c'] AS chunk,
       |    md5(r.u['c']) AS h, length(r.u['c']) AS len
       |  FROM seg CROSS JOIN UNNEST(list_transform(range(1, len(starts) + 1),
       |    i -> struct_pack(i := i, c := text[starts[i]:ends[i]]))) AS r(u)
       |)""".stripMargin
  }
}
