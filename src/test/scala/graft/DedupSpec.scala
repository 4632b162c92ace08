package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, TextFns}
import graft.operators.Dedup

/** Dedup operator suite: planted duplicates must be found (recall), verified
  * metrics must be exact (precision). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup of 1
    (4L, "completely different content about spark query engines and shuffles here"),
    (5L, "an unrelated sentence mentioning neither foxes nor dogs at all whatsoever")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical text, keeps min id") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 4) // 1&2 collapse
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("doc_id") == 1L)
  }

  test("minhash near-dups: finds exact + near pair, skips unrelated (recall/precision)") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)) || pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) || Set(a, b).contains(5L) })
  }

  test("bucket cap: a planted 50-doc mega-bucket (viral boilerplate) is " +
    "excluded from pair generation and reported with its dropped mass; " +
    "ordinary near-dups still pair") {
    val template = "subscribe to our newsletter for daily updates and offers today"
    val viral = (100L until 150L).map(i => (i, template))
    val corpus = (docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq ++ viral).toDF("doc_id", "text")
    val sh = corpus.select(col("doc_id"),
      TextFns.wordShingles(col("text"), 3).as("__sh"))
    val (pairs, dropped) = Dedup.minhashCandidatesCapped(
      sh, "doc_id", "__sh", bands = 32, maxBucketWidth = 16)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no pair between two viral copies survives the cap
    assert(!got.exists { case (a, b) => a >= 100L && b >= 100L },
      s"mega-bucket pairs leaked: $got")
    // the ordinary near-dup family still produces its candidates
    assert(got.contains((1L, 2L)), s"near-dup candidates lost: $got")
    // dropped-mass report: identical docs share EVERY band bucket, so all
    // 32 bands report one 50-wide bucket with 50*49/2 = 1225 pairs dropped
    val rep = dropped.collect()
    assert(rep.length == 32, s"expected 32 over-wide buckets, got ${rep.length}")
    assert(rep.forall(_.getAs[Long]("width") == 50L))
    assert(rep.forall(_.getAs[Long]("pairs_dropped") == 1225L))
    // uncapped control: the same corpus WOULD emit the quadratic pair set
    val uncapped = Dedup.minhashCandidatesFromShingles(
      sh, "doc_id", "__sh", bands = 32)
      .filter(col("a") >= 100L && col("b") >= 100L).count()
    assert(uncapped == 1225L)
    // simhash twin: identical text -> identical signature -> all 4 bands
    // over-wide; the capped path emits NO viral pairs and reports 4 buckets
    val (sp, sdrop) = Dedup.simhashNearDupsCapped(corpus,
      maxBucketWidth = 16)
    assert(!sp.collect().map(r => (r.getLong(0), r.getLong(1)))
      .exists { case (a, b) => a >= 100L && b >= 100L })
    val srep = sdrop.collect()
    assert(srep.length == 4 && srep.forall(_.getAs[Long]("width") == 50L))
    // embedding twin: 50 copies of one constant vector -> identical
    // hyperplane signatures -> all 4 bands report a 50-wide bucket; the
    // capped path emits no intra-family pair while the two planted
    // near-identical organic vectors still verify
    val vecs = ((1L to 8L).map(i =>
        (i, Array.tabulate(64)(d => ((d * i) % 7).toFloat / 7f - 0.4f))) ++
      Seq((9L, Array.tabulate(64)(d => ((d * 1L) % 7).toFloat / 7f - 0.4f + (if (d == 0) 0.01f else 0f)))) ++
      (100L until 150L).map(i => (i, Array.fill(64)(0.5f))))
      .toDF("vec_id", "embedding")
    val (ep, edrop) = Dedup.embeddingNearDupsCapped(vecs,
      threshold = 0.98, maxBucketWidth = 16)
    val epairs = ep.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!epairs.exists { case (a, b) => a >= 100L && b >= 100L },
      s"embedding mega-bucket pairs leaked: $epairs")
    assert(epairs.contains((1L, 9L)), s"organic near-dup lost: $epairs")
    val erep = edrop.collect()
    assert(erep.length == 4 && erep.forall(_.getAs[Long]("width") == 50L),
      s"expected 4 width-50 buckets: ${erep.toSeq}")
  }

  test("minhash jaccard estimate is exact 1.0 for identical docs") {
    val j = Dedup.minhashNearDups(docs, threshold = 0.5, bands = 32)
      .filter(col("a") === 1 && col("b") === 2).select("jaccard")
      .as[Double].collect()
    assert(j.length == 1 && j.head == 1.0)
  }

  test("simhash: identical docs at hamming 0; near dup within 3; unrelated far") {
    val sigs = docs.select(col("doc_id"),
      HashExprs.simhash64(TextFns.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 10)
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("minhash signature lanes approximate true jaccard (property-ish)") {
    val a = (1 to 60).map(i => s"tok$i")
    val b = (1 to 60).map(i => if (i <= 45) s"tok$i" else s"other$i") // J = 45/75 = 0.6
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      .select(col("id"), HashExprs.minhashSig(col("toks"), 256).as("sig"))
    val Array(s1, s2) = df.orderBy("id").collect()
      .map(_.getAs[scala.collection.Seq[Long]]("sig"))
    val agree = s1.zip(s2).count { case (x, y) => x == y } / 256.0
    assert(math.abs(agree - 0.6) < 0.12, s"estimated $agree, expected ~0.6")
  }

  test("embedding near-dups find planted perturbed copies") {
    val base = (0 until 20).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val planted = base.map { case (id, v) =>
      (id + 1000L, v.zipWithIndex.map { case (x, j) => if (j == 0) x + 0.01f else x })
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, threshold = 0.98, nPlanes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with 8 bands of 2 bits, recall on 0.999-cosine pairs should be ~complete
    val found = base.count { case (id, _) => pairs.contains((id, id + 1000L)) }
    assert(found >= 18, s"found only $found/20 planted near-identical pairs")
  }

  test("incremental dedup: batch matches corpus asymmetrically, best match wins") {
    val corpus = docs // ids 1-5
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // = doc 1/2
      (102L, "entirely novel content that matches nothing in the existing corpus text")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(batch, corpus, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 101 ties docs 1 and 2 at jaccard 1.0 -> min corpus id wins
    assert(got.keySet == Set(101L))
    assert(got(101L) == (1L, 1.0))
  }

  test("incremental embedding dedup: each perturbed batch vector's rank-1 " +
    "match is its source corpus vector at the verify threshold") {
    val embs = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val batch = embs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.05f)).otherwise(x))
          .as("embedding"))
    val out = Dedup.incrementalEmbeddingNearDups(batch, embs,
      threshold = 0.98).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 100000L &&
        r.getDouble(2) >= 0.98)
    }
  }

  test("incremental dedup from STORED artifacts equals the inline form") {
    val corpus = docs
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (102L, "entirely novel content that matches nothing in the existing corpus text")
    ).toDF("doc_id", "text")
    val sh = corpus.select(col("doc_id"),
      TextFns.wordShingles(col("text"), 3).as("__sh"))
    val bands = Dedup.minhashBandBuckets(sh, "doc_id", "__sh")
    val hashes = sh.select(col("doc_id"),
      org.apache.spark.sql.functions.transform(col("__sh"),
        x => org.apache.spark.sql.functions.xxhash64(x)).as("sh"))
    val indexed = Dedup.incrementalNearDupsFromArtifacts(batch, bands, hashes,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = Dedup.incrementalNearDups(batch, corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(indexed == inline && indexed.nonEmpty)
  }

  test("incremental dedup plan contains no corpus self-join (two-sided band join)") {
    val batch = Seq((101L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    // shape check: runs and returns columns (batch_id, match_id, jaccard)
    val out = Dedup.incrementalNearDups(batch, docs, threshold = 0.9)
    assert(out.columns.toSeq == Seq("batch_id", "match_id", "jaccard"))
  }

  test("boilerplate lines: frequent lines stripped, order kept, all-boilerplate doc survives empty") {
    val corpus = Seq(
      (1L, "unique alpha\nshared footer\nunique beta"),
      (2L, "other body\nshared footer"),
      (3L, "shared footer"), // every line boilerplate -> empty survivor
      (4L, "solo document with no footer at all")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateLines(corpus, minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == ("unique alpha\nunique beta", 1L)) // order preserved
    assert(got(2L) == ("other body", 1L))
    assert(got(3L) == ("", 1L)) // row survives with empty text
    assert(got(4L) == ("solo document with no footer at all", 0L))
    assert(got.size == 4)
  }

  test("boilerplate lines: below-threshold duplicates are kept") {
    val corpus = Seq(
      (1L, "twice line\nbody one"),
      (2L, "twice line\nbody two")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateLines(corpus, minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "twice line\nbody one")
    assert(got(2L) == "twice line\nbody two")
  }
}
