package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcChunk

/** Content-defined chunking: lossless slicing, and the resync property
  * that justifies CDC over a fixed-size grid. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val text =
    "key agg row scan slow fast table value part hash value table part " +
    "a row fast merge batch part value fast spark a a the line sort " +
    "table window table table key order data column agg join small line"

  private def chunksOf(docs: Seq[(Long, String)]): Map[Long, Seq[String]] =
    CdcChunk.chunked(docs.toDF("doc_id", "text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("chunks concatenate back to the original text (lossless, no gaps)") {
    val ch = chunksOf(Seq((1L, text)))(1L)
    assert(ch.size > 2, s"expected multiple chunks, got ${ch.size}")
    assert(ch.mkString == text)
    assert(ch.forall(_.nonEmpty))
  }

  test("resync: prepending one char leaves every chunk after the first " +
      "boundary byte-identical (fixed-size grids shift all of them)") {
    val both = chunksOf(Seq((1L, text), (2L, "Z" + text)))
    val base = both(1L)
    val shifted = both(2L)
    // the first boundary of `text` is a boundary of "Z"+text at +1, so the
    // chunk sequences agree from there on
    val tail = base.drop(1)
    assert(tail.nonEmpty)
    assert(shifted.takeRight(tail.size) == tail,
      s"CDC failed to resynchronize: ${shifted.takeRight(tail.size)} vs $tail")
  }

  test("short and null docs: no boundaries -> one whole-text chunk; " +
      "null text drops") {
    val both = chunksOf(Seq((1L, "tiny"), (2L, null)))
    assert(both(1L) == Seq("tiny"))
    assert(!both.contains(2L))
  }

  test("native boundary pass == composed built-in twin, including the " +
      "non-ASCII char-window fallback") {
    val docs = Seq(
      (1L, text), (2L, "tiny"), (3L, text + " extra tail words here"),
      (4L, "héllo wörld " + text + " ünicode tail"))
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
      CdcChunk.cdcBoundaries(col("text"), 8, 32).as("native"),
      CdcChunk.boundariesBuiltin(col("text"), 8, 32).as("builtin"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Int](1)} != " +
          s"builtin ${r.getSeq[Int](2)}")
    }
    // the unicode doc must actually exercise boundaries (non-empty)
    assert(both.find(_.getLong(0) == 4L).get.getSeq[Int](1).nonEmpty)
  }

  test("store round trip: every doc reassembles exactly, and duplicate " +
      "content is stored once (store < recipes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-store")
      .toString
    val docs = Seq((1L, text), (2L, text), (3L, "tiny"))
      .toDF("doc_id", "text")
    val out = CdcChunk.storeRoundTrip(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_._3), s"every doc must reassemble: ${out.toSeq}")
    val recipes = spark.read.parquet(s"$dir/recipes").count()
    val store = spark.read.parquet(s"$dir/store").count()
    assert(store < recipes,
      s"doc 2 duplicates doc 1, so the store ($store) must hold fewer " +
        s"rows than the recipes ($recipes)")
  }

  test("dedupStats: identical docs keep chunks once; counts reconcile") {
    val stats = CdcChunk.dedupStats(
        Seq((1L, text), (2L, text)).toDF("doc_id", "text"))
      .orderBy(col("doc_id")).collect()
    val first = stats(0)
    val second = stats(1)
    assert(first.getLong(1) == second.getLong(1)) // same n_chunks
    assert(first.getLong(2) == first.getLong(1))  // doc 1 keeps everything
    assert(second.getLong(2) == 0L)               // doc 2 keeps nothing
    assert(first.getLong(3) == text.length.toLong)
    assert(second.getLong(3) == 0L)
  }
}
