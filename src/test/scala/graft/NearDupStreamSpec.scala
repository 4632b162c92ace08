package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.NearDupStream

/** Streaming near-dup dedup: tier semantics across batches, crash-replay
  * idempotency, and the bucket-width guard's wiring. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ndstream-$tag").toString

  private val d1 =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val d2 =
    "completely different content about spark query engines and shuffles now"
  private val d3 =
    "a fresh unrelated paragraph mentioning gardens rivers and tall mountains"
  private val d4 =
    "statistics over token streams need careful exact integer arithmetic here"

  test("three tiers across a real two-drain replay: exact copy dropped " +
    "vs store, perturbed copy dropped via the stored index, within-batch " +
    "twin resolved min-id, novel docs kept") {
    val root = tmp("replay")
    val src = s"$root/src"; val store = s"$root/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // threshold 0.4: a one-word change in these ~10-word docs gives
    // jaccard 5/11 ≈ 0.45 (3 of 8 shingles replaced) — near at 0.4,
    // distinct at the organic-pair distances the unrelated docs sit at
    def drain(): Unit = {
      val q = NearDupStream.start(NearDupStream.readDocs(spark, src), store,
        s"$root/ck", threshold = 0.4)
      q.processAllAvailable(); q.stop()
    }
    Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    Seq(
      (11L, d1),                                    // exact copy of kept 1
      (12L, d2.replace("spark", "flink")),          // near copy of kept 2
      (13L, d3),                                    // novel
      (14L, d4),                                    // novel, twin below
      (15L, d4.replace("careful", "cautious"))      // within-batch near of 14
    ).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    drain()
    val kept = NearDupStream.kept(spark, store).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(kept == Set((1L, 0), (2L, 0), (13L, 1), (14L, 1)))
    val verdicts = NearDupStream.log(spark, store).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(verdicts == Map(
      1L -> "kept", 2L -> "kept", 11L -> "dup_exact", 12L -> "dup_near",
      13L -> "kept", 14L -> "kept", 15L -> "dup_near"))
    assert(NearDupStream.capReport(spark, store).count() == 0)
  }

  test("re-applying a batch is idempotent: partition overwrite + " +
    "deterministic recompute leave every store unchanged (crash replay)") {
    val store = tmp("idem")
    val b0 = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val b1 = Seq((11L, d1), (12L, d3), (13L, d3 + " extended slightly"))
      .toDF("doc_id", "text")
    NearDupStream.applyBatch(b0, 0L, store, threshold = 0.5)
    NearDupStream.applyBatch(b1, 1L, store, threshold = 0.5)
    def snap() = (
      NearDupStream.kept(spark, store).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet,
      NearDupStream.log(spark, store).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet,
      spark.read.parquet(s"$store/docs").count(),
      spark.read.parquet(s"$store/log").count())
    val before = snap()
    NearDupStream.applyBatch(b1, 1L, store, threshold = 0.5) // crash replay
    assert(snap() == before)
    assert(before._1.map(_._1) == Set(1L, 2L, 12L))
  }

  test("bucket-width guard is wired: a planted rotation family (identical " +
    "shingle sets, pairwise-distinct texts) lands over-cap, generates no " +
    "pairs, and is REPORTED; all members survive to the store") {
    val cycle = Array("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    val fam = (0 until 6).map { r =>
      val rot = cycle.drop(r) ++ cycle.take(r)
      (100L + r, (rot ++ rot).mkString(" "))
    }
    val store = tmp("cap")
    NearDupStream.applyBatch(fam.toDF("doc_id", "text"), 0L, store,
      threshold = 0.5, maxBucketWidth = 4)
    val rep = NearDupStream.capReport(spark, store).collect()
    assert(rep.nonEmpty && rep.forall(_.getAs[Long]("width") == 6L))
    assert(rep.forall(_.getAs[Long]("pairs_dropped") == 15L))
    assert(NearDupStream.kept(spark, store).count() == 6)
    assert(NearDupStream.log(spark, store).collect()
      .forall(_.getString(1) == "kept"))
  }

  test("retract + compact: a tombstoned doc stops matching and its later " +
    "copy re-enters; compaction serves the same live set, physically " +
    "purges every store, clears tombstones, and appends keep working") {
    val stTomb = tmp("retract"); val stComp = tmp("compact")
    val b0 = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val b1 = Seq((11L, d1), (12L, d2)).toDF("doc_id", "text")
    for (st <- Seq(stTomb, stComp)) {
      NearDupStream.applyBatch(b0, 0L, st, threshold = 0.4)
      NearDupStream.retract(Seq(1L).toDF("doc_id"), st)
    }
    NearDupStream.compact(spark, stComp)
    for (name <- Seq("docs"))
      assert(spark.read.parquet(s"$stComp/$name")
        .where(col("doc_id") === 1L).count() == 0, s"$name not purged")
    assert(!new java.io.File(s"$stComp/retracted").exists())
    for (st <- Seq(stTomb, stComp))
      NearDupStream.applyBatch(b1, 1L, st, threshold = 0.4)
    def keptSet(st: String) = NearDupStream.kept(spark, st).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    // 1 retracted -> its exact copy 11 re-enters; 2 live -> 12 drops exact
    assert(keptSet(stTomb) == Set((2L, 0), (11L, 1)))
    assert(keptSet(stTomb) == keptSet(stComp))
    val v = NearDupStream.log(spark, stTomb).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(v(11L) == "kept" && v(12L) == "dup_exact")
  }

  test("the gate fixture's organic replay never trips the shipped cap: " +
    "empty report at every batch (the guard must not eat real pairs)") {
    val store = tmp("organic")
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    NearDupStream.applyBatch(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), 0L, store)
    NearDupStream.applyBatch(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")),
      1L, store)
    NearDupStream.applyBatch(
      docs.select((col("doc_id") + 200000).as("doc_id"),
          regexp_replace(col("text"), "\\bdata\\b", "info").as("text"))
        .unionByName(docs.select((col("doc_id") + 300000).as("doc_id"),
          regexp_replace(regexp_replace(col("text"), "\\bdata\\b", "info"),
            "\\bthe\\b", "thee").as("text"))),
      2L, store)
    assert(NearDupStream.capReport(spark, store).count() == 0)
    // the cross-batch tiers actually fired: every even doc's +100000 exact
    // copy is gone, and the kept set spans all three batches
    val kept = NearDupStream.kept(spark, store)
    assert(kept.filter(col("batch") === 0).count() > 0)
    val evens = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select((col("doc_id") + 100000).as("doc_id"))
    assert(kept.join(evens, Seq("doc_id")).count() == 0)
  }
}
