package graft

import org.apache.spark.sql.functions._

import graft.sources.Erasure

/** Keyed erasure: only affected partitions rewrite (untouched partition
  * files stay byte-identical), emptied partitions' directories drop, and
  * null-keyed rows survive a null-safe keep predicate. */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private def listFiles(dir: java.nio.file.Path): Map[String, Long] = {
    val s = java.nio.file.Files.walk(dir)
    try s.filter(p => java.nio.file.Files.isRegularFile(p))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .map(p => dir.relativize(p).toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    finally s.close()
  }

  test("erasure rewrites only affected partitions, drops emptied ones, " +
    "and keeps null-keyed rows") {
    val root = java.nio.file.Files.createTempDirectory("erasure-spec")
    val store = root.resolve("store").toString
    try {
      val rows = Seq[(java.lang.Long, Int, String)](
        (10L, 0, "keep"), (11L, 0, "keep"),
        (20L, 1, "erase-me"), (21L, 1, "erase-me too"), // cohort 1 empties
        (30L, 2, "keep"), (31L, 2, "erase from 2"),
        (null, 2, "null-keyed must survive"))
        .toDF("user_id", "cohort", "payload")
      rows.write.partitionBy("cohort").mode("overwrite").parquet(store)
      val before = listFiles(java.nio.file.Paths.get(store, "cohort=0"))
      val victims = Seq(20L, 21L, 31L)
      val dropped = Erasure.eraseFromStore(spark, store, "cohort",
        affectedPartitions = Seq(1, 2),
        keep = !coalesce(col("user_id").isin(victims: _*), lit(false)))
      assert(dropped == Seq("cohort=1"), s"emptied partition must drop: $dropped")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(store, "cohort=1")),
        "erased data must not linger in an emptied partition directory")
      // untouched partition: identical file set, untouched mtimes
      val after = listFiles(java.nio.file.Paths.get(store, "cohort=0"))
      assert(after == before, "cohort 0 files must be byte-untouched")
      val left = spark.read.parquet(store)
        .select(col("user_id"), col("cohort")).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getInt(1)))
        .toSet
      assert(left == Set((10L, 0), (11L, 0), (30L, 2), (-1L, 2)),
        s"survivors wrong: $left")
    } finally {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }
}
