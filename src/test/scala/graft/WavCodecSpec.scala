package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WavCodec
import graft.operators.WavCodec.Pcm

/** RIFF/WAVE PCM16 codec contract: byte-exact round trips, real chunk
  * walking (metadata chunks skipped by size, pad bytes honored), and loud
  * failure on anything the codec does not genuinely parse. */
class WavCodecSpec extends AnyFunSuite {

  test("encode/decode round-trips samples bit-exactly, negatives included") {
    val s = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val got = WavCodec.decode(WavCodec.encode(Pcm(16000, 1, s)))
    assert(got.sampleRate == 16000 && got.channels == 1)
    assert(got.samples.toSeq == s.toSeq)
  }

  test("stereo round trip preserves interleaving and frame count") {
    val s = Array[Short](10, -10, 20, -20, 30, -30) // 3 frames x 2 ch
    val got = WavCodec.decode(WavCodec.encode(Pcm(44100, 2, s)))
    assert(got.channels == 2 && got.samples.toSeq == s.toSeq)
  }

  test("little-endian layout is real: a known sample produces known bytes") {
    val bytes = WavCodec.encode(Pcm(8000, 1, Array[Short](0x0102)))
    // the data chunk is the last 2 payload bytes of the file (even size,
    // no pad): LE means low byte first
    assert(bytes(bytes.length - 2) == 0x02.toByte)
    assert(bytes(bytes.length - 1) == 0x01.toByte)
  }

  test("decoder walks chunks: the LIST metadata chunk is skipped by size") {
    val enc = WavCodec.encode(Pcm(8000, 1, Array[Short](7, -7)))
    // the encoder always emits LIST between fmt and data; a fixed-offset
    // 44-byte-header parser would read the LIST header as samples
    val listIdx = enc.indexOfSlice("LIST".getBytes("US-ASCII"))
    val dataIdx = enc.indexOfSlice("data".getBytes("US-ASCII"))
    assert(listIdx > 0 && dataIdx > listIdx)
    assert(WavCodec.decode(enc).samples.toSeq == Seq(7.toShort, -7.toShort))
  }

  test("odd-sized chunks carry a pad byte and still parse (RIFF alignment)") {
    // the embedded ISFT payload is 5 bytes (odd) by construction, so every
    // encoded file exercises the pad-byte rule before reaching data
    val enc = WavCodec.encode(Pcm(8000, 1, Array[Short](1, 2, 3)))
    assert(WavCodec.decode(enc).samples.toSeq == Seq[Short](1, 2, 3))
  }

  test("stripMetadata drops LIST/INFO (and any other ancillary chunk) " +
    "verbatim-copying fmt/data; the PCM stream survives sample-for-sample") {
    val pcm = Pcm(16000, 1, Array[Short](9, -9, 127, 0, -32768))
    val enc = WavCodec.encode(pcm, Seq(
      "ISFT" -> "graft-engine", "IART" -> "author-42", "ICMT" -> "hello"))
    assert(WavCodec.chunkIds(enc) == Seq("fmt ", "LIST", "data"))
    val stripped = WavCodec.stripMetadata(enc)
    assert(WavCodec.chunkIds(stripped) == Seq("fmt ", "data"))
    val a = WavCodec.decode(enc)
    val b = WavCodec.decode(stripped)
    assert(a.sampleRate == b.sampleRate && a.channels == b.channels)
    assert(a.samples.toSeq == b.samples.toSeq)
    // removed = 8 hdr + 4 'INFO' + (8+12) ISFT + (8+9+1) IART + (8+5+1)
    // ICMT = 64; the l + pad arithmetic the gate's oracle restates
    assert(enc.length - stripped.length == 64)
    // idempotent: a clean file strips to itself
    assert(WavCodec.stripMetadata(stripped).toSeq == stripped.toSeq)
  }

  test("stripMetadata clamps a final odd-sized chunk that omits its trailing " +
    "pad byte (accepted by the chunk walk, which never reads the pad)") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le32(v: Int) = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def le16(v: Int) = ByteBuffer.allocate(2)
      .order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    // final data chunk declares 3 payload bytes and the file ends there:
    // the RIFF pad byte is omitted, which decode()/chunkIds() accept
    val data = "data".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3)
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
    val enc = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    assert(WavCodec.chunkIds(enc) == Seq("fmt ", "data"))
    val out = WavCodec.stripMetadata(enc) // must not throw AIOOBE
    // the rewritten file carries the pad explicitly, zero-filled
    assert(out.length == 12 + (8 + 16) + (8 + 3 + 1))
    assert(out.last == 0.toByte)
    assert(WavCodec.chunkIds(out) == Seq("fmt ", "data"))
    assert(out.slice(out.length - 4, out.length - 1).toSeq ==
      Seq[Byte](1, 2, 3))
  }

  test("corrupt and unsupported inputs raise, never silently decode") {
    val good = WavCodec.encode(Pcm(8000, 1, Array[Short](5, 6)))
    intercept[IllegalArgumentException] { // not RIFF
      WavCodec.decode("nope".getBytes ++ good.drop(4))
    }
    intercept[IllegalArgumentException] { // truncated mid-chunk
      WavCodec.decode(good.dropRight(3))
    }
    val nonPcm = good.clone() // flip the fmt tag to 3 (IEEE float)
    val fmtIdx = nonPcm.indexOfSlice("fmt ".getBytes("US-ASCII"))
    nonPcm(fmtIdx + 8) = 3
    intercept[IllegalArgumentException] { WavCodec.decode(nonPcm) }
  }
}
