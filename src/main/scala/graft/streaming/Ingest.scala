package graft.streaming

import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Fns._
import graft.plans.IdaMart

/** Streaming ingest into the fact store — the reference's batch load loop
  * (ON CONFLICT DO NOTHING per batch, /root/reference/etl/etl_ida.py:461-554)
  * as a Structured Streaming `foreachBatch` sink.
  *
  * Effect is exactly-once on the store even though foreachBatch is
  * at-least-once: a replayed micro-batch (crash between write and checkpoint
  * commit, or duplicate input files) re-runs the anti-join against the
  * already-persisted hashes and appends nothing. One shuffle per batch
  * (hash dedup); the anti-join probe reads only the hash column of the
  * store thanks to parquet column pruning.
  */
object Ingest {

  /** Hash-canonicalize a normalized record batch (F8 form, IdaMart.fact). */
  def hashRecords(batch: DataFrame): DataFrame =
    batch.withColumn("hash_registro",
      recordHash(
        date_format(col("ano_mes"), "yyyy-MM-dd"),
        col("grupo_economico"), col("servico"), col("variavel"),
        money2(col("valor"))))

  /** Start an idempotent append of streaming records into `factDir`. */
  def start(records: DataFrame, factDir: String,
            checkpointDir: String): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = IdaMart.firstWinsDedup(
          hashRecords(batch), Seq("hash_registro"), "linha_origem")
        val fresh = Try(spark.read.parquet(factDir)).toOption match {
          case Some(existing) => IdaMart.load(existing, deduped)
          case None           => deduped
        }
        fresh.write.mode("append").parquet(factDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
