package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: stubbed decode is deterministic; metadata filters
  * prune before decode; frame sampling preserves shape. */
class MultimodalSpec extends SparkSpec {

  test("decodeStub is deterministic and keyed 1:1 to input rows") {
    val media = Multimodal.mediaFromDocuments(
      Tables.documents(spark, sf0001).limit(50))
    val a = Multimodal.decodeStub(media).collect().sortBy(_.id)
    val b = Multimodal.decodeStub(media).collect().sortBy(_.id)
    assert(a.length == 50)
    assert(a.map(_.checksum).sameElements(b.map(_.checksum)))
    assert(a.map(_.features.toSeq).sameElements(b.map(_.features.toSeq)))
    // n_bytes matches the actual payload length
    a.zip(media.collect().sortBy(_.id)).foreach { case (f, m) =>
      assert(f.n_bytes == m.bytes.length && f.kind == m.kind)
    }
  }

  test("metadata filter prunes rows without touching the decode stage") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
    val wide = media.filter(col("width") >= 320)
    val n = wide.count()
    assert(n > 0 && n < media.count())
    // decode runs only on the filtered set
    assert(Multimodal.decodeStub(wide).count() == n)
  }

  test("binary fixture round-trips through the binaryFile source exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-png-spec")
    try {
      val docs = Tables.documents(spark, sf0001)
      val written = Multimodal.writePngFixture(docs, dir.toString, maxId = 20)
      assert(written > 0)
      val media = Multimodal.readBinaryMedia(spark, dir.toString)
        .collect().sortBy(_.id)
      assert(media.length == written)
      val texts = docs.filter(col("doc_id") < 20 && col("text").isNotNull &&
          length(col("text")) > 0)
        .select(col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      media.foreach { m =>
        // fixtureText: id 3 carries the planted non-ASCII suffix — the
        // staged bytes are the SUFFIXED text's UTF-8 encoding
        val expected = Multimodal.PngSignature ++
          Multimodal.fixtureText(m.id, texts(m.id))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        assert(m.bytes.sameElements(expected), s"id=${m.id}")
        // the signature must survive: first byte 0x89, 'PNG' at 1..3
        assert((m.bytes(0) & 0xff) == 0x89 &&
          new String(m.bytes.slice(1, 4)) == "PNG")
      }
      // decode over file-sourced bytes differs from text-only bytes (the
      // signature is IN the checksum) but stays deterministic
      val viaFiles = Multimodal.decodeStub(
        Multimodal.readBinaryMedia(spark, dir.toString))
        .collect().map(f => f.id -> f.checksum).toMap
      val viaText = Multimodal.decodeStub(
          Multimodal.mediaFromDocuments(docs.filter(col("doc_id") < 20)))
        .collect().map(f => f.id -> f.checksum).toMap
      viaFiles.foreach { case (id, ck) => assert(ck != viaText(id), s"id=$id") }
    } finally {
      val s = java.nio.file.Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("real PNG fixture: staged files decode back to the document bytes " +
      "through the distributed binaryFile scan") {
    val dir = java.nio.file.Files.createTempDirectory("png-real-spec")
    try {
      val docs = Tables.documents(spark, sf0001)
      val n = Multimodal.writeRealPngFixture(docs, dir.toString, maxId = 40)
      assert(n > 0)
      val decoded = Multimodal.decodePngFiles(spark, dir.toString)
        .collect().map(d => d.id -> d).toMap
      assert(decoded.size == n)
      docs.filter(col("doc_id") < 40 && col("text").isNotNull &&
          length(col("text")) > 0)
        .select(col("doc_id"), col("text")).collect().foreach { r =>
          val bytes = Multimodal.fixtureText(r.getLong(0), r.getString(1))
            .getBytes("UTF-8")
          val d = decoded(r.getLong(0))
          assert(d.width == 1 + bytes.length % 31)
          assert(d.height == (bytes.length + d.width - 1) / d.width)
          assert(d.pixel_sum == bytes.map(b => (b & 0xff).toLong).sum)
          assert(d.n_pix == d.width.toLong * d.height)
        }
      // and the files are REAL PNGs: Java's own ImageIO agrees on the
      // pixels (an independent decoder, not our codec reading itself)
      val one = java.nio.file.Files.list(dir).sorted().findFirst().get()
      val img = javax.imageio.ImageIO.read(one.toFile)
      assert(img != null, "ImageIO could not read the staged PNG")
      val ours = graft.operators.PngCodec.decode(
        java.nio.file.Files.readAllBytes(one))
      assert(img.getWidth == ours.width && img.getHeight == ours.height)
      val raster = img.getRaster
      for (y <- 0 until ours.height; x <- 0 until ours.width)
        assert(raster.getSample(x, y, 0) ==
          (ours.pixels(y * ours.width + x) & 0xff))
    } finally {
      val s = java.nio.file.Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("ahashPngFiles: closed-form bits on a half-dark image, " +
    "identical images collide, different images differ") {
    import graft.operators.PngCodec
    val dir = java.nio.file.Files.createTempDirectory("ahash-spec")
    try {
      // 8x8 grayscale, left half 0 / right half 200: grid samples hit
      // every pixel, mean = 100, exactly the right-half columns (c >= 4)
      // exceed it — bits k with k%8 >= 4
      val half = Array.tabulate(64)(i => if (i % 8 >= 4) 200.toByte else 0.toByte)
      java.nio.file.Files.write(dir.resolve("img_00001.png"),
        PngCodec.encode(PngCodec.Image(8, 8, 1, half)))
      java.nio.file.Files.write(dir.resolve("img_00002.png"),
        PngCodec.encode(PngCodec.Image(8, 8, 1, half)))
      val grad = Array.tabulate(64)(i => (i * 4).toByte)
      java.nio.file.Files.write(dir.resolve("img_00003.png"),
        PngCodec.encode(PngCodec.Image(8, 8, 1, grad)))
      val got = Multimodal.ahashPngFiles(spark, dir.toString)
        .collect().map(h => h.id -> ((h.ahash_a, h.ahash_b))).toMap
      var expA = 0L; var expB = 0L
      (0 until 64).filter(_ % 8 >= 4).foreach { k =>
        if (k < 32) expA |= 1L << k else expB |= 1L << (k - 32)
      }
      assert(got(1L) == ((expA, expB)), "closed-form right-half bits")
      assert(got(1L) == got(2L), "identical content collides")
      assert(got(1L) != got(3L), "different content separates")
    } finally {
      val s = java.nio.file.Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("apngSceneCuts: hand-computed aHash, L1 deltas, and cut decisions " +
    "on a crafted three-frame animation (frame 0 diffs against black)") {
    import graft.operators.PngCodec
    val dir = java.nio.file.Files.createTempDirectory("scenecut").toString
    // 8x4 gray frames: f0 = all 10s; f1 = identical (no cut);
    // f2 = half 200s half 0s (hard cut)
    val flat = Array.fill[Byte](32)(10)
    val split = (Array.fill[Byte](16)(200.toByte) ++ Array.fill[Byte](16)(0))
    val bytes = PngCodec.encodeApng(Seq(
      PngCodec.Frame(1, 100, flat), PngCodec.Frame(1, 100, flat),
      PngCodec.Frame(1, 100, split)), width = 8, height = 4, channels = 1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "vid_00007.png"), bytes)
    val rows = Multimodal.apngSceneCuts(spark, dir, cutThreshold = 512)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.id).toSet == Set(7L) && rows.length == 3)
    // f0: mean 10, no pixel > 10 -> hash 0; delta vs black = 320 -> no cut
    assert(rows(0).ahash == 0L && rows(0).delta_l1 == 320L && !rows(0).is_cut)
    // f1: identical frame -> delta 0, no cut
    assert(rows(1).ahash == 0L && rows(1).delta_l1 == 0L && !rows(1).is_cut)
    // f2: mean 100 -> first 16 pixels set; delta = 16*190 + 16*10 = 3200
    assert(rows(2).ahash == 0xffffL && rows(2).delta_l1 == 3200L &&
      rows(2).is_cut)
  }

  test("imageNearDupPairs: every planted pixel-0 variant is found as a " +
    "candidate of its original with a small Hamming distance") {
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString
    Multimodal.writeNearDupPngFixture(
      Tables.documents(spark, sf0001), dir, maxId = 64, every = 4)
    val hashes = Multimodal.ahashPngFiles(spark, dir).toDF()
      .select(col("id"), col("ahash_a"), col("ahash_b"))
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = hashes.select("id").collect().map(_.getLong(0))
      .filter(_ >= 100000L).map(_ - 100000L)
    assert(planted.nonEmpty)
    for (id <- planted) {
      val hit = pairs.find(p => p._1 == id && p._2 == id + 100000L)
      assert(hit.isDefined, s"planted variant of $id not found")
      assert(hit.get._3 <= 16 && hit.get._3 >= 0)
    }
    pairs.foreach { case (a, b, hmm) =>
      assert(a < b && hmm <= 16, s"bad pair ($a,$b,$hmm)")
    }
  }

  test("audioFingerprint + banded LSH: every planted sample-0 variant is " +
    "found as a near-dup of its original; short files drop") {
    val dir = java.nio.file.Files.createTempDirectory("wav-neardup").toString
    Multimodal.writeNearDupWavFixture(
      Tables.documents(spark, sf0001), dir, maxId = 64, every = 4)
    val fps = Multimodal.audioFingerprint(spark, dir).toDF()
      .select(col("id"), col("ahash_a"), col("ahash_b"))
    val nSamples = Multimodal.audioFingerprint(spark, dir)
      .collect().map(f => f.id -> f.n_samples).toMap
    assert(nSamples.values.forall(_ >= 64), "sub-64-sample files must drop")
    val pairs = Multimodal.imageNearDupPairs(fps, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = nSamples.keys.filter(_ >= 100000L).map(_ - 100000L).toSeq
    assert(planted.nonEmpty)
    for (id <- planted) {
      val hit = pairs.find(p => p._1 == id && p._2 == id + 100000L)
      assert(hit.isDefined, s"planted variant of $id not found")
      assert(hit.get._3 <= 16 && hit.get._3 >= 0)
    }
  }

  test("videoFingerprint + banded LSH: every planted frame-0 variant is " +
    "found at Hamming <= 1; short clips drop; the fingerprint is selective") {
    val dir = java.nio.file.Files.createTempDirectory("apng-neardup").toString
    Multimodal.writeNearDupApngFixture(
      Tables.documents(spark, sf0001), dir, maxId = 64, every = 4)
    val fps = Multimodal.videoFingerprint(spark, dir)
    val byId = fps.collect().map(f => f.id -> f).toMap
    assert(byId.values.forall(_.n_frames >= 4), "sub-4-frame clips must drop")
    val pairs = Multimodal.imageNearDupPairs(
        fps.toDF().select(col("id"), col("ahash_a"), col("ahash_b")),
        maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = byId.keys.filter(_ >= 100000L).map(_ - 100000L).toSeq
    assert(planted.nonEmpty)
    for (id <- planted) {
      val hit = pairs.find(p => p._1 == id && p._2 == id + 100000L)
      assert(hit.isDefined, s"planted variant of $id not found")
      // the single-pixel edit flips exactly dHash bit 0 of frame 0,
      // sampled by exactly slot 0 of the timeline
      assert(hit.get._3 <= 1, s"planted pair hamming ${hit.get._3}")
    }
    // selectivity: candidate pairs should be dominated by real dups, not
    // the corpus cross product (the biased-aHash design this replaced
    // matched ~16% of ALL pairs)
    val n = byId.size.toLong
    assert(pairs.length < n * (n - 1) / 20,
      s"${pairs.length} pairs of ${n * (n - 1) / 2} possible")
  }

  test("wavSegments: closed-form silence-split over a staged PCM16 file " +
    "(threshold inclusive, sub-minSilence gaps merge, negatives count)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wavseg")
    val s = Array[Short](
      9000, 9000, 9000,      // active run
      0, 0, 8191,            // 3 quiet (8191 is below threshold): merges
      8192,                  // active, exactly at the inclusive threshold
      0, 0, 0, 0,            // 4 quiet: closes the segment
      -20000,                // negative amplitude opens a new segment
      0, 0)
    java.nio.file.Files.write(dir.resolve("aud_00007.wav"),
      graft.operators.WavCodec.encode(
        graft.operators.WavCodec.Pcm(8000, 1, s)))
    val got = Multimodal.wavSegments(spark, dir.toString)
      .collect().sortBy(_.seg_idx)
    assert(got.length == 2, got.toSeq.toString)
    assert(got(0) == Multimodal.WavSegment(7L, 0L, 0L, 6L, 7L, 4L, 9000L))
    assert(got(1) == Multimodal.WavSegment(7L, 1L, 11L, 11L, 1L, 1L, 20000L))
  }

  test("frameSampleStub: one row per stride window, non-empty frames") {
    val media = Multimodal.mediaFromDocuments(
      Tables.documents(spark, sf0001).limit(10))
    val frames = Multimodal.frameSampleStub(media, stride = 64, frameLen = 16)
    val byId = frames.groupBy("id").agg(count(lit(1)).as("n"),
        max(col("frame_idx")).as("max_idx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    media.collect().foreach { m =>
      val expected = math.max(1, math.ceil(m.bytes.length / 64.0).toInt)
      val (n, maxIdx) = byId(m.id)
      assert(n == expected, s"id=${m.id} bytes=${m.bytes.length}")
      assert(maxIdx == expected - 1)
    }
  }

  test("png metadata strip: tEXt round-trips in, stripAncillary removes " +
    "exactly the ancillary tags, keeps bytes of critical chunks, and is " +
    "idempotent") {
    import graft.operators.PngCodec
    val img = PngCodec.Image(3, 2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    val base = PngCodec.encode(img)
    assert(PngCodec.chunkTags(base) == Seq("IHDR", "IDAT", "IEND"))
    val meta = PngCodec.withTextChunks(base,
      Seq("Author" -> "user-7@example.com", "Comment" -> "doc-7"))
    assert(PngCodec.chunkTags(meta) ==
      Seq("IHDR", "tEXt", "tEXt", "IDAT", "IEND"))
    // the decoder skips (but CRC-checks) ancillary chunks
    assert(java.util.Arrays.equals(PngCodec.decode(meta).pixels, img.pixels))
    val stripped = PngCodec.stripAncillary(meta)
    assert(java.util.Arrays.equals(stripped, base),
      "critical chunks must survive byte-for-byte")
    assert(java.util.Arrays.equals(PngCodec.stripAncillary(stripped), stripped))
    // removed bytes = framing(12) + keyword + NUL + value per tEXt chunk
    val expectRemoved = (12 + 6 + 1 + 18) + (12 + 7 + 1 + 5)
    assert(meta.length - stripped.length == expectRemoved)
  }
}
