package graft

import graft.plans.Curation

/** Composed curation pipeline: every stage must prune its planted victim
  * and the survivors pack into bins. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val goodEn =
    "the quick brown fox jumps over the lazy dog with many unique extra words"

  test("dup, contaminated, non-english, short, repetitive docs drop; survivors pack") {
    val docs = Seq(
      (1L, "s", goodEn + " first"),
      (2L, "s", goodEn + " first"),                    // exact dup of 1 -> dedup drops
      (3L, "s", "alpha beta gamma " + goodEn),         // shares bench 3-gram -> decontam drops
      (4L, "s", "der die das und ist nicht mit ein zu von der die das und ist"), // de -> langid drops
      (5L, "s", "the too short"),                      // < 10 tokens -> quality drops
      (6L, "s", "the spam spam spam spam spam spam spam spam spam spam spam"), // uniq 2/12 -> quality drops
      (7L, "s", goodEn + " second"),
      (97L, "s", "alpha beta gamma delta epsilon")     // benchmark split (97 % 97 == 0)
    ).toDF("doc_id", "source", "text")
    val out = Curation.curate(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "s" && r.getLong(1) == 0L) // one bin
    assert(r.getLong(2) == 2L)                          // docs 1 and 7 survive
    assert(r.getLong(4) == 1L && r.getLong(5) == 7L)
  }

  test("empty corpus packs to zero bins") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(Curation.curate(docs).collect().isEmpty)
  }
}
