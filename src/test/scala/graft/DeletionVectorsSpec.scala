package graft

import org.apache.spark.sql.functions._

import graft.sources.DeletionVectors

/** Merge-on-read deletion-vector contract: deletes never rewrite base
  * files, reads subtract the broadcast sidecar union, and compaction
  * folds the vectors back into a pure scan with identical content. */
class DeletionVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String = {
    val d = java.nio.file.Files.createTempDirectory("dvspec").toString
    s"$d/store"
  }

  private def baseFiles(store: String): Set[String] = {
    val dir = new java.io.File(s"$store/base")
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getName}:${f.lastModified}:${f.length}").toSet
  }

  test("delete transactions leave base files byte-identical on disk") {
    val store = freshStore()
    DeletionVectors.writeBase((1L to 100L).toDF("doc_id"), store)
    val before = baseFiles(store)
    DeletionVectors.deleteKeys(Seq(3L, 7L).toDF("doc_id"), store, txnId = 1)
    assert(baseFiles(store) == before, "MOR delete must not touch base")
    assert(DeletionVectors.readMerged(spark, store).count() == 98)
  }

  test("sidecars accumulate per transaction; merged read subtracts the union") {
    val store = freshStore()
    DeletionVectors.writeBase((1L to 50L).toDF("doc_id"), store)
    DeletionVectors.deleteKeys(Seq(1L, 2L).toDF("doc_id"), store, 1)
    DeletionVectors.deleteKeys(Seq(2L, 49L).toDF("doc_id"), store, 2)
    val got = DeletionVectors.readMerged(spark, store)
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(got == ((3L to 48L) :+ 50L))
    // a repeated txn id refuses to overwrite an existing sidecar
    intercept[Exception] {
      DeletionVectors.deleteKeys(Seq(9L).toDF("doc_id"), store, 1)
    }
  }

  test("the delete side of the merged read is broadcast") {
    val store = freshStore()
    DeletionVectors.writeBase((1L to 20L).toDF("doc_id"), store)
    DeletionVectors.deleteKeys(Seq(4L).toDF("doc_id"), store, 1)
    val plan = DeletionVectors.readMerged(spark, store)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join, got:\n$plan")
  }

  test("compact folds vectors into base: same rows, no sidecars, pure scan") {
    val store = freshStore()
    DeletionVectors.writeBase(
      (1L to 40L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp"), store)
    DeletionVectors.deleteKeys(Seq(5L, 10L, 15L).toDF("doc_id"), store, 1)
    val before = DeletionVectors.readMerged(spark, store)
      .orderBy("doc_id").collect().toSeq
    DeletionVectors.compact(spark, store)
    assert(!new java.io.File(s"$store/_deletes").exists())
    val after = DeletionVectors.readMerged(spark, store)
    assert(after.orderBy("doc_id").collect().toSeq == before)
    // post-compaction reads carry no anti-join at all
    assert(!after.queryExecution.executedPlan.toString.contains("LeftAnti"))
  }

  test("a store with no delete transactions reads as the plain base") {
    val store = freshStore()
    DeletionVectors.writeBase((1L to 10L).toDF("doc_id"), store)
    assert(DeletionVectors.readMerged(spark, store).count() == 10)
  }
}
