package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file BLOOM FILTER manifest — the point-lookup data-skipping layer
  * the table formats add where min/max stats cannot help (Delta bloom
  * filter indexes, Iceberg's parquet bloom properties, ClickHouse skip
  * indexes): when the store is clustered on some OTHER column, a
  * high-cardinality key is scattered so every file's [min, max] interval
  * covers the probe and range stats prune nothing — but a per-file bloom
  * answers "can this file contain key x?" probabilistically, with false
  * POSITIVES only (a file is never wrongly skipped; Bloom 1970).
  *
  * Layout: m bits per file as 64-bit words, built in ONE aggregation
  * pass — each row contributes k = `hashes` positions (xxhash64 salted
  * by probe index, pmod m), exploded to (file, word, bit-mask) and
  * OR-folded per (file, word). The manifest is PLANNER metadata bounded
  * by |files| x m/64 rows, independent of row count — the same contract
  * as [[StatsManifest]]; at 100 TB the membership test becomes a
  * semi-join of probe positions against the manifest table instead of a
  * driver collect (documented bound: the collect here is
  * |files| x m/64).
  *
  * Probe hashing runs through the SAME Catalyst xxhash64 expression used
  * at build time (evaluated on a literal frame) — no reimplementation to
  * drift. */
object BloomSkip {

  /** Build the per-file bloom manifest over `keyCol`:
    * `(file, word, mask)` rows, `m` bits per file, `hashes` probes per
    * key. */
  def build(spark: SparkSession, path: String, keyCol: String,
            m: Int = 1 << 18, hashes: Int = 3): DataFrame = {
    require(m >= 64 && (m & (m - 1)) == 0,
      s"BloomSkip.build: m must be a power of two >= 64, got $m")
    require(hashes >= 1, s"BloomSkip.build: hashes must be >= 1")
    // keyCol is hashed AT ITS CAST-TO-BIGINT VALUE: xxhash64 is
    // type-dependent, and the probe side ([[probePositions]]) always
    // hashes BIGINT keys — without this cast an INT-typed key column
    // would hash differently, every probe would miss, and files
    // containing the key would be WRONGLY skipped (silent missing rows,
    // breaking the no-false-negative contract). keyCol must be integral.
    val probes = array((0 until hashes).map { i =>
      val p = pmod(xxhash64(lit(i), col(keyCol).cast("bigint")), lit(m.toLong))
      struct((p / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
          .as("mask"))
    }: _*)
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), explode(probes).as("p"))
      .groupBy(col("file"), col("p.word").as("word"))
      .agg(bit_or(col("p.mask")).as("mask"))
  }

  /** The k (word, mask) probe positions for each key — evaluated through
    * the same Catalyst hash expression as [[build]], on a literal frame. */
  private def probePositions(spark: SparkSession, keys: Seq[Long],
                             m: Int, hashes: Int): Map[Long, Seq[(Int, Long)]] = {
    import spark.implicits._
    keys.toDF("key")
      .select(col("key"), explode(array((0 until hashes).map { i =>
        val p = pmod(xxhash64(lit(i), col("key")), lit(m.toLong))
        struct((p / 64).cast("int").as("word"),
          call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
            .as("mask"))
      }: _*)).as("p"))
      .select(col("key"), col("p.word"), col("p.mask"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getInt(1), r.getLong(2))).toSeq
      }
  }

  /** Point-lookup scan through the bloom manifest: read ONLY the files
    * whose bloom admits at least one probed key, then apply the exact
    * IN predicate (blooms prune FILES, never rows — false positives cost
    * I/O, never correctness). Returns the frame plus (filesRead,
    * filesTotal) so callers can assert skipping happened. */
  def lookupScan(spark: SparkSession, path: String, manifest: DataFrame,
                 keyCol: String, keys: Seq[Long],
                 m: Int = 1 << 18, hashes: Int = 3): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "BloomSkip.lookupScan: no keys")
    val pos = probePositions(spark, keys, m, hashes)
    // |files| x m/64 bounded collect (planner metadata — scaladoc)
    val words = manifest.select(col("file"), col("word"), col("mask"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) =>
        f -> rows.map(r => r.getInt(1) -> r.getLong(2))
          .groupBy(_._1).map { case (w, ms) =>
            w -> ms.map(_._2).reduce(_ | _)
          }
      }
    val allFiles = words.keys.toSeq.sorted
    require(allFiles.nonEmpty, "BloomSkip.lookupScan: empty manifest")
    val keep = allFiles.filter { f =>
      val bits = words(f)
      keys.exists(k => pos(k).forall { case (w, mask) =>
        (bits.getOrElse(w, 0L) & mask) == mask
      })
    }
    val pred = col(keyCol).isin(keys: _*)
    val df =
      if (keep.nonEmpty) spark.read.parquet(keep: _*).filter(pred)
      else spark.read.parquet(allFiles: _*).filter(lit(false))
    (df, keep.size, allFiles.size)
  }
}
