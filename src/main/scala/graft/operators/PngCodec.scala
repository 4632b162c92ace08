package graft.operators

/** Minimal REAL PNG codec — pure JVM, zero external dependencies: zlib via
  * `java.util.zip` (the JDK ships the real DEFLATE), CRC-32 via
  * `java.util.zip.CRC32`, and the full PNG scanline filter set (None /
  * Sub / Up / Average / Paeth, ISO/IEC 15948 §9) implemented directly.
  * This replaces the former decode STUB for image payloads: bytes staged
  * to disk are genuinely valid PNG files (readable by any image viewer),
  * and the decode path genuinely inflates and unfilters them — the codec
  * boundary the reference never has (its pipeline is spreadsheet-only;
  * image support is this engine's training-data extension).
  *
  * Scope (honest contract): 8-bit-depth, non-interlaced images in
  * grayscale (color type 0), truecolor (2), gray+alpha (4) and RGBA (6) —
  * the profiles whose decode is pure byte arithmetic. Palette (3),
  * sub-byte depths and Adam7 interlace still need a real imaging library
  * and fail loudly. Decoding VERIFIES chunk CRCs and the decompressed
  * length, so corrupt or truncated payloads raise, never silently decode.
  *
  * Scale shape: encode/decode are per-row narrow operations used inside
  * `mapPartitions` ([[Multimodal]]) — the exact seam where a JNI codec
  * would sit at 100 TB; no shuffle, no driver involvement. */
object PngCodec {

  /** The 8-byte PNG file signature (ISO/IEC 15948 §5.2). */
  val Signature: Array[Byte] =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

  /** A decoded image: `channels` interleaved 8-bit samples per pixel,
    * row-major. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 4 => 2 // grayscale + alpha
    case 6 => 4 // truecolor + alpha
    case t => throw new IllegalArgumentException(
      s"PngCodec: unsupported color type $t (palette/reserved need a " +
        "real imaging library)")
  }

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc32(t, data))
  }

  /** Paeth predictor (ISO/IEC 15948 §9.4) — shared by encode and decode. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Scanline-filter and zlib-deflate one image's pixel grid — one
    * complete zlib stream, the payload of an IDAT (or, per frame, an
    * APNG fdAT sequence). */
  private def filterAndDeflate(img: Image,
                               filterForRow: Int => Int): Array[Byte] = {
    val Image(w, h, ch, px) = img
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f = filterForRow(y)
      require(f >= 0 && f <= 4, s"PngCodec.encode: filter $f out of range")
      raw(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = px(y * stride + x) & 0xff
        val left = if (x >= ch) px(y * stride + x - ch) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul =
          if (y > 0 && x >= ch) px((y - 1) * stride + x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  private def validateDims(img: Image): Unit = {
    require(img.width > 0 && img.height > 0,
      s"PngCodec.encode: empty image ${img.width}x${img.height}")
    require(img.pixels.length == img.width.toLong * img.height * img.channels,
      s"PngCodec.encode: ${img.pixels.length} samples != " +
        s"${img.width}x${img.height} x${img.channels}")
  }

  private def colorTypeOf(ch: Int): Int = ch match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(
      s"PngCodec.encode: unsupported channel count $n")
  }

  private def ihdrData(w: Int, h: Int, ch: Int): Array[Byte] =
    be32(w.toLong) ++ be32(h.toLong) ++
      Array(8.toByte, colorTypeOf(ch).toByte, 0.toByte, 0.toByte, 0.toByte)

  /** Encode an image as a fully valid PNG. `filterForRow` picks the
    * scanline filter per row (default cycles through all five, so a
    * decode round-trip exercises every unfilter path — a constant-0
    * encoder would leave Sub/Up/Average/Paeth dead code). */
  def encode(img: Image, filterForRow: Int => Int = _ % 5): Array[Byte] = {
    validateDims(img)
    Signature ++ chunk("IHDR", ihdrData(img.width, img.height, img.channels)) ++
      chunk("IDAT", filterAndDeflate(img, filterForRow)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One animation frame: full-canvas pixels + its display delay
    * (`delayNum/delayDen` seconds, APNG fcTL semantics). */
  final case class Frame(delayNum: Int, delayDen: Int, pixels: Array[Byte])

  /** A decoded animation: shared canvas geometry + ordered frames. */
  final case class Animation(width: Int, height: Int, channels: Int,
                             frames: Seq[Frame])

  /** Encode frames as a fully valid ANIMATED PNG (APNG, PNG Third
    * Edition / the original Mozilla extension): acTL declares the frame
    * count, each frame gets an fcTL (sequenced, full-canvas, zero delay
    * offsets, dispose/blend = none/source), frame 0 rides the IDAT and
    * later frames ride fdAT chunks — each frame an independent complete
    * zlib stream. Any APNG-aware viewer plays these. */
  def encodeApng(frames: Seq[Frame], width: Int, height: Int,
                 channels: Int,
                 filterForRow: Int => Int = _ % 5): Array[Byte] = {
    require(frames.nonEmpty, "PngCodec.encodeApng: no frames")
    frames.foreach(f =>
      validateDims(Image(width, height, channels, f.pixels)))
    var seq = 0L
    def fctl(f: Frame): Array[Byte] = {
      val data = be32(seq) ++ be32(width.toLong) ++ be32(height.toLong) ++
        be32(0L) ++ be32(0L) ++ be16(f.delayNum) ++ be16(f.delayDen) ++
        Array(0.toByte, 0.toByte) // dispose APNG_DISPOSE_OP_NONE, blend SOURCE
      seq += 1
      chunk("fcTL", data)
    }
    val head = Signature ++
      chunk("IHDR", ihdrData(width, height, channels)) ++
      chunk("acTL", be32(frames.length.toLong) ++ be32(0L)) // loop forever
    val first = fctl(frames.head) ++ chunk("IDAT",
      filterAndDeflate(Image(width, height, channels, frames.head.pixels),
        filterForRow))
    val rest = frames.tail.flatMap { f =>
      val ctl = fctl(f)
      val data = be32(seq) ++ filterAndDeflate(
        Image(width, height, channels, f.pixels), filterForRow)
      seq += 1
      ctl ++ chunk("fdAT", data)
    }.toArray
    head ++ first ++ rest ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG: signature + chunk walk with CRC verification, IHDR
    * parse, IDAT inflate, per-scanline unfilter. Throws on anything
    * malformed — a corrupt blob must never silently decode. */
  /** Ordered chunk tags of a PNG byte stream — the audit view. */
  def chunkTags(bytes: Array[Byte]): Seq[String] = {
    require(bytes.length >= 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "PngCodec.chunkTags: not a PNG")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 8
    while (off < bytes.length) {
      require(off + 8 <= bytes.length, "PngCodec.chunkTags: truncated header")
      val len = readBe32(bytes, off).toInt
      require(len >= 0 && off + 12L + len <= bytes.length,
        "PngCodec.chunkTags: truncated chunk")
      out += new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      off += 12 + len
    }
    out.toSeq
  }

  /** Insert `tEXt` metadata chunks (PNG 1.2 §4.2.3: Latin-1 keyword, NUL
    * separator, text) immediately after IHDR — the fixture side of the
    * metadata-scrub audit. */
  def withTextChunks(png: Array[Byte],
                     entries: Seq[(String, String)]): Array[Byte] = {
    require(png.length >= 8 + 25, "PngCodec.withTextChunks: no IHDR")
    val ihdrEnd = 8 + 12 + readBe32(png, 8).toInt // signature + IHDR chunk
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val text = entries.map { case (k, v) =>
      chunk("tEXt", k.getBytes(latin1) ++ Array(0.toByte) ++ v.getBytes(latin1))
    }.reduce(_ ++ _)
    java.util.Arrays.copyOfRange(png, 0, ihdrEnd) ++ text ++
      java.util.Arrays.copyOfRange(png, ihdrEnd, png.length)
  }

  /** Keep only CRITICAL chunks (PNG §5.4: a chunk is ancillary iff the
    * first tag letter is lowercase — bit 5 set) — the EXIF-strip analog
    * for PNG: tEXt/iTXt/zTXt/tIME/eXIf etc. all drop, IHDR/PLTE/IDAT/IEND
    * survive byte-for-byte (kept ranges are copied, CRCs untouched, so
    * the stripped file stays fully valid). */
  def stripAncillary(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "PngCodec.stripAncillary: not a PNG")
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    out.write(bytes, 0, 8)
    var off = 8
    while (off < bytes.length) {
      val len = readBe32(bytes, off).toInt
      require(len >= 0 && off + 12L + len <= bytes.length,
        "PngCodec.stripAncillary: truncated chunk")
      val ancillary = (bytes(off + 4) & 0x20) != 0
      if (!ancillary) out.write(bytes, off, 12 + len)
      off += 12 + len
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "PngCodec.decode: not a PNG (bad signature)")
    var off = 8
    var w = -1; var h = -1; var ch = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "PngCodec.decode: truncated chunk header")
      val len = readBe32(bytes, off).toInt
      val tag = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"PngCodec.decode: truncated $tag chunk")
      val data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
      val expectCrc = readBe32(bytes, off + 8 + len)
      require(crc32(tag.getBytes(
          java.nio.charset.StandardCharsets.US_ASCII), data) == expectCrc,
        s"PngCodec.decode: CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          require(len == 13, "PngCodec.decode: IHDR length != 13")
          w = readBe32(data, 0).toInt; h = readBe32(data, 4).toInt
          val bitDepth = data(8) & 0xff; val colorType = data(9) & 0xff
          val interlace = data(12) & 0xff
          require(bitDepth == 8,
            s"PngCodec.decode: bit depth $bitDepth unsupported (8 only)")
          require(interlace == 0,
            "PngCodec.decode: Adam7 interlace unsupported")
          ch = channelsOf(colorType)
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _      => () // ancillary chunk: CRC-checked above, skipped
      }
      off += 12 + len
    }
    require(w > 0 && h > 0 && ch > 0, "PngCodec.decode: missing IHDR")
    Image(w, h, ch, inflateAndUnfilter(idat.toByteArray, w, h, ch))
  }

  /** Inflate one complete zlib stream of filtered scanlines and undo the
    * per-row filters — shared by still decode (IDAT) and animation frame
    * decode (per-frame fdAT streams). */
  private def inflateAndUnfilter(data: Array[Byte], w: Int, h: Int,
                                 ch: Int): Array[Byte] = {
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(data)
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inflater.finished(),
        "PngCodec.decode: truncated image data stream")
      filled += n
    }
    val extra = inflater.inflate(new Array[Byte](1))
    inflater.end()
    require(filled == raw.length && extra == 0,
      s"PngCodec.decode: decompressed length $filled != ${raw.length}")
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      var x = 0
      while (x < stride) {
        val v = raw(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= ch) px(y * stride + x - ch) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul =
          if (y > 0 && x >= ch) px((y - 1) * stride + x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
          case other => throw new IllegalArgumentException(
            s"PngCodec.decode: invalid filter byte $other in row $y")
        }
        px(y * stride + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** Decode an ANIMATED PNG: the still-PNG chunk walk (CRC-verified)
    * plus the APNG animation chunks — acTL frame count, per-frame fcTL
    * control (sequence numbers must be consecutive from 0; this decoder's
    * scope is full-canvas frames with dispose NONE / blend SOURCE, which
    * is what [[encodeApng]] writes — offsets or compositing would need a
    * canvas compositor), IDAT as frame 0's stream, fdAT streams for the
    * rest. Each frame is an independent zlib stream, inflated and
    * unfiltered exactly like a still image. Throws on malformed input —
    * sequence gaps, frame-count mismatch, offsets, truncation. */
  def decodeApng(bytes: Array[Byte]): Animation = {
    require(bytes.length >= 8 && Signature.indices.forall(i =>
        bytes(i) == Signature(i)),
      "PngCodec.decodeApng: not a PNG (bad signature)")
    var off = 8
    var w = -1; var h = -1; var ch = -1
    var declared = -1
    var nextSeq = 0L
    final case class Pending(delayNum: Int, delayDen: Int,
                             data: java.io.ByteArrayOutputStream)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Pending]
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length,
        "PngCodec.decodeApng: truncated chunk header")
      val len = readBe32(bytes, off).toInt
      val tag = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"PngCodec.decodeApng: truncated $tag chunk")
      val data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
      val expectCrc = readBe32(bytes, off + 8 + len)
      require(crc32(tag.getBytes(
          java.nio.charset.StandardCharsets.US_ASCII), data) == expectCrc,
        s"PngCodec.decodeApng: CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          require(len == 13, "PngCodec.decodeApng: IHDR length != 13")
          w = readBe32(data, 0).toInt; h = readBe32(data, 4).toInt
          require((data(8) & 0xff) == 8,
            "PngCodec.decodeApng: bit depth != 8 unsupported")
          require((data(12) & 0xff) == 0,
            "PngCodec.decodeApng: Adam7 interlace unsupported")
          ch = channelsOf(data(9) & 0xff)
        case "acTL" =>
          require(len == 8, "PngCodec.decodeApng: acTL length != 8")
          declared = readBe32(data, 0).toInt
        case "fcTL" =>
          require(len == 26, "PngCodec.decodeApng: fcTL length != 26")
          require(readBe32(data, 0) == nextSeq,
            s"PngCodec.decodeApng: fcTL sequence ${readBe32(data, 0)} != " +
              s"expected $nextSeq")
          nextSeq += 1
          require(readBe32(data, 4).toInt == w &&
              readBe32(data, 8).toInt == h &&
              readBe32(data, 12) == 0 && readBe32(data, 16) == 0,
            "PngCodec.decodeApng: sub-canvas frames unsupported " +
              "(need a compositor)")
          require((data(24) & 0xff) == 0 && (data(25) & 0xff) == 0,
            "PngCodec.decodeApng: dispose/blend ops unsupported")
          val dNum = ((data(20) & 0xff) << 8) | (data(21) & 0xff)
          val dDen = ((data(22) & 0xff) << 8) | (data(23) & 0xff)
          frames += Pending(dNum, dDen, new java.io.ByteArrayOutputStream())
        case "IDAT" =>
          require(frames.length == 1,
            "PngCodec.decodeApng: IDAT outside frame 0 (an fcTL must " +
              "precede it; a default image excluded from the animation " +
              "is out of scope)")
          frames.head.data.write(data)
        case "fdAT" =>
          require(len >= 4, "PngCodec.decodeApng: fdAT too short")
          require(readBe32(data, 0) == nextSeq,
            s"PngCodec.decodeApng: fdAT sequence ${readBe32(data, 0)} != " +
              s"expected $nextSeq")
          nextSeq += 1
          require(frames.nonEmpty, "PngCodec.decodeApng: fdAT before fcTL")
          frames.last.data.write(data, 4, len - 4)
        case "IEND" => done = true
        case _      => ()
      }
      off += 12 + len
    }
    require(w > 0 && h > 0 && ch > 0, "PngCodec.decodeApng: missing IHDR")
    require(declared >= 1, "PngCodec.decodeApng: missing acTL (not animated)")
    require(frames.length == declared,
      s"PngCodec.decodeApng: acTL declares $declared frames, " +
        s"found ${frames.length}")
    Animation(w, h, ch, frames.toSeq.map(p =>
      Frame(p.delayNum, p.delayDen,
        inflateAndUnfilter(p.data.toByteArray, w, h, ch))))
  }
}
