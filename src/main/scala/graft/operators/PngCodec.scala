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

  /** Encode an image as a fully valid PNG. `filterForRow` picks the
    * scanline filter per row (default cycles through all five, so a
    * decode round-trip exercises every unfilter path — a constant-0
    * encoder would leave Sub/Up/Average/Paeth dead code). */
  def encode(img: Image, filterForRow: Int => Int = _ % 5): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(w > 0 && h > 0, s"PngCodec.encode: empty image ${w}x$h")
    require(px.length == w.toLong * h * ch,
      s"PngCodec.encode: ${px.length} samples != ${w}x$h x$ch")
    val colorType = ch match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
      case n => throw new IllegalArgumentException(
        s"PngCodec.encode: unsupported channel count $n")
    }
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
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG: signature + chunk walk with CRC verification, IHDR
    * parse, IDAT inflate, per-scanline unfilter. Throws on anything
    * malformed — a corrupt blob must never silently decode. */
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
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inflater.finished(),
        "PngCodec.decode: truncated IDAT stream")
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
    Image(w, h, ch, px)
  }
}
