package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletes via DELETION VECTORS — the Delta/Iceberg v2
  * pattern (Delta "deletion vectors", Iceberg "position/equality delete
  * files"): a delete transaction writes a small SIDECAR of deleted row
  * keys next to the immutable base files instead of rewriting them; the
  * read path subtracts the union of sidecars from the base scan. This is
  * the complement of [[Erasure.eraseFromStore]]'s copy-on-write partition
  * rewrite (gated by `s_gdpr_delete`): COW pays the rewrite at delete
  * time and keeps reads pure; MOR makes deletes O(|deleted keys|) and
  * pays a (broadcast) anti-join at read time — the right trade when
  * deletes are sparse and base files are 100-TB-scale.
  *
  * Layout: `store/base/...` immutable data files; `store/_deletes/
  * txn=N/` one key-list parquet per delete transaction (equality-delete
  * sidecars — key-based like Iceberg equality deletes, so no reliance on
  * physical row positions, which Spark's parquet reader does not expose
  * stably across compactions).
  *
  * Scale shape: each sidecar holds ONLY the deleted keys of one
  * transaction; the merged read is `base LEFT ANTI JOIN (union of
  * sidecars)` with the delete side explicitly `broadcast()` — sparse
  * deletes stay a map-side probe with zero shuffle of the base data at
  * any base size. `compact` folds the vectors into rewritten base files
  * and drops the sidecars (the maintenance job that bounds read-side
  * work), after which reads carry no anti-join. */
object DeletionVectors {

  /** Write the immutable base store. */
  def writeBase(df: DataFrame, store: String): Unit =
    df.write.mode("overwrite").parquet(s"$store/base")

  /** One delete TRANSACTION: append sidecar `txn=<id>` holding the keys
    * to delete. Base files are untouched — this is the whole point. */
  def deleteKeys(keys: DataFrame, store: String, txnId: Int,
                 keyCol: String = "doc_id"): Unit =
    keys.select(col(keyCol)).distinct()
      .write.mode("errorifexists").parquet(s"$store/_deletes/txn=$txnId")

  /** Merge-on-read scan: base minus the union of all delete sidecars.
    * The delete side is broadcast — sidecars are |deleted keys|-sized by
    * contract, never base-sized. */
  def readMerged(spark: SparkSession, store: String,
                 keyCol: String = "doc_id"): DataFrame = {
    val base = spark.read.parquet(s"$store/base")
    val dvDir = new java.io.File(s"$store/_deletes")
    if (!dvDir.exists() || dvDir.listFiles() == null ||
        !dvDir.listFiles().exists(_.getName.startsWith("txn=")))
      base
    else {
      val dv = spark.read.parquet(s"$store/_deletes").select(col(keyCol))
      base.join(broadcast(dv), Seq(keyCol), "left_anti")
    }
  }

  /** Fold the deletion vectors into the base files (the compaction /
    * maintenance job): rewrite base as the merged view, drop sidecars.
    * After this, reads are pure scans again. */
  def compact(spark: SparkSession, store: String,
              keyCol: String = "doc_id"): Unit = {
    val merged = readMerged(spark, store, keyCol).cache()
    merged.count() // materialize before overwriting the files it reads
    merged.write.mode("overwrite").parquet(s"$store/base_next")
    merged.unpersist()
    // atomic-ish swap: point base at the rewritten files, retire sidecars
    val fs = new java.io.File(store)
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
      f.delete()
    }
    delete(new java.io.File(fs, "base"))
    delete(new java.io.File(fs, "_deletes"))
    new java.io.File(fs, "base_next").renameTo(new java.io.File(fs, "base"))
  }
}
