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
}
