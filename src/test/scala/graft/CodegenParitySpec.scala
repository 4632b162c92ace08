package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, HashExprs, TextFns, TextExprs, UnicodeFns}
import graft.operators.{CdcChunk, Unigram}

/** Forces `spark.sql.codegen.factoryMode = CODEGEN_ONLY` over every custom
  * expression in the engine and pins the results to the interpreted path
  * (NO_CODEGEN). The default FALLBACK mode silently reverts to interpreted
  * eval when generated code fails to compile — so without this suite a
  * broken `doGenCode` would pass every other spec and only show up as a
  * per-row performance cliff in production. CODEGEN_ONLY makes a janino
  * failure a hard test failure. */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  private val FactoryMode = "spark.sql.codegen.factoryMode"

  private def withFactoryMode[T](mode: String)(body: => T): T = {
    val prev = spark.conf.getOption(FactoryMode)
    spark.conf.set(FactoryMode, mode)
    try body finally prev match {
      case Some(v) => spark.conf.set(FactoryMode, v)
      case None => spark.conf.unset(FactoryMode)
    }
  }

  /** Collect under both factory modes and require identical rows. */
  private def pinned(df: => DataFrame): Unit = {
    val gen = withFactoryMode("CODEGEN_ONLY")(df.collect().map(_.toString))
    val interp = withFactoryMode("NO_CODEGEN")(df.collect().map(_.toString))
    assert(gen.nonEmpty && gen.sameElements(interp))
  }

  private lazy val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the data engineering pipeline processes data daily",
    "café déjà vu résumé",           // accents (NFC composed)
    "café déjà vu",                          // decomposed forms
    "short",
    "  repeated   whitespace\tand tabs  ",
    "").toDF("text")

  test("hash expressions: fnv1a64 / simhash64 / minhash_sig") {
    pinned(texts.select(
      HashExprs.fnv1a64Col(col("text")).as("fnv"),
      HashExprs.simhash64(split(col("text"), "\\s+")).as("sim"),
      HashExprs.minhashSig(split(col("text"), "\\s+"), k = 16).as("mh")))
  }

  test("text expressions: word/char shingles and jaccard (incl. null case)") {
    pinned(texts.select(
      TextExprs.wordShingles(split(col("text"), "\\s+"), 3).as("ws"),
      TextExprs.charShingles(col("text"), 4).as("cs"),
      TextExprs.jaccardSim(
        TextExprs.wordShingles(split(col("text"), "\\s+"), 2),
        TextExprs.charShingles(col("text"), 6)).as("jac_str"),
      TextExprs.jaccardSim(
        transform(split(col("text"), "\\s+"), t => xxhash64(t)),
        transform(split(reverse(col("text")), "\\s+"), t => xxhash64(t)))
        .as("jac_long")))
  }

  test("unicode expressions: nfc / strip_accents") {
    pinned(texts.select(
      UnicodeFns.nfc(col("text")).as("nfc"),
      UnicodeFns.stripAccents(col("text")).as("sa")))
  }

  test("bpe count: native merge-pass loop") {
    pinned(texts.select(Bpe.tokenCount(col("text")).as("n")))
    // and the generated path still equals the built-in replace chain
    withFactoryMode("CODEGEN_ONLY") {
      val diff = texts.select(Bpe.tokenCount(col("text")).as("nat"),
          Bpe.tokenCountBuiltin(col("text")).as("ref"))
        .filter(col("nat") =!= col("ref")).count()
      assert(diff == 0L)
    }
  }

  test("viterbi segmentation: table hit and miss (null) paths") {
    val words = Seq("data", "dat", "a", "xyz", "").toDF("w")
    val subs = Seq("d", "a", "t", "da", "ta", "dat", "data")
    val lps = Seq(-100000L, -90000L, -110000L, -150000L, -140000L,
      -200000L, -210000L)
    pinned(words.select(col("w"),
      Unigram.viterbiSeg(col("w"), subs, lps).as("seg")))
    // xyz has no table entry -> null under BOTH paths
    withFactoryMode("CODEGEN_ONLY") {
      val r = words.filter(col("w") === "xyz")
        .select(Unigram.viterbiSeg(col("w"), subs, lps)).head
      assert(r.isNullAt(0))
    }
  }

  test("cdc boundaries: native rolling window == built-in twin") {
    withFactoryMode("CODEGEN_ONLY") {
      val docs = graft.sources.Tables.documents(spark, sf0001)
        .filter(col("text").isNotNull).limit(100)
      val diff = docs.select(
          CdcChunk.cdcBoundaries(col("text"), 8, 32).as("nat"),
          CdcChunk.boundariesBuiltin(col("text"), 8, 32).as("ref"))
        .filter(to_json(col("nat")) =!= to_json(col("ref"))).count()
      assert(diff == 0L)
    }
  }

  test("an end-to-end dedup gate runs under CODEGEN_ONLY") {
    withFactoryMode("CODEGEN_ONLY") {
      val rows = SparkEntry.queries("dedup_minhash")(spark, sf0001).collect()
      assert(rows.nonEmpty)
    }
  }
}
