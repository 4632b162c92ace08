package graft

import org.apache.spark.sql.functions._

import graft.functions.UnicodeFns._

/** NFC composition + accent folding: canonical equivalence becomes byte
  * equality, folding strips combining marks, and both are idempotent and
  * null-safe. The non-ASCII literals carry deliberate composed vs
  * decomposed byte sequences (verified: C3A9 'é' vs 65 CC81 'e'+U+0301)
  * — an editor or formatter that Unicode-normalizes this file would
  * break the first test loudly, not silently. */
class UnicodeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("NFC makes composed and decomposed forms byte-equal") {
    val df = Seq(("café", "café")).toDF("composed", "decomposed")
      .select(col("composed"), col("decomposed"),
        (col("composed") === col("decomposed")).as("raw_eq"),
        (nfc(col("composed")) === nfc(col("decomposed"))).as("nfc_eq"),
        length(nfc(col("decomposed"))).as("nfc_len"))
    val r = df.collect().head
    assert(!r.getBoolean(2), "raw forms must differ (5 vs 4 code points)")
    assert(r.getBoolean(3), "NFC forms must be equal")
    assert(r.getInt(4) == 4)
  }

  test("stripAccents folds pt-BR accents from composed AND decomposed input") {
    val rows = Seq("ação", "a̧ção",
      "água", "plain").toDF("s")
      .select(stripAccents(col("s"))).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("acao", "acao", "agua", "plain"))
  }

  test("idempotence and null safety") {
    val df = Seq(Some("café"), None).toDF("s")
      .select(col("s"), nfc(nfc(col("s"))).as("n2"),
        stripAccents(stripAccents(col("s"))).as("f2"),
        nfc(col("s")).as("n1"), stripAccents(col("s")).as("f1"))
    val rs = df.collect()
    val some = rs.find(!_.isNullAt(0)).get
    assert(some.getString(1) == some.getString(3))
    assert(some.getString(2) == some.getString(4))
    val none = rs.find(_.isNullAt(0)).get
    assert(none.isNullAt(1) && none.isNullAt(2))
  }
}
