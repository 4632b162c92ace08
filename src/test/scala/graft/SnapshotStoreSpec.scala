package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Transaction-log time travel: historical versions stay readable after
  * overwrite, commits are atomic-by-protocol, replay is exact. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("append/append/overwrite: every version reads back its exact state") {
    val root = java.nio.file.Files.createTempDirectory("snap-spec")
    val store = root.resolve("tbl").toString
    try {
      val v1 = SnapshotStore.commitAppend(Seq((1, "a"), (2, "b"))
        .toDF("id", "v"), store)
      val v2 = SnapshotStore.commitAppend(Seq((3, "c")).toDF("id", "v"), store)
      val v3 = SnapshotStore.commitOverwrite(Seq((9, "z")).toDF("id", "v"),
        store)
      assert((v1, v2, v3) == ((1, 2, 3)))
      assert(SnapshotStore.currentVersion(store) == 3)
      def ids(v: Int) = SnapshotStore.snapshotAt(spark, store, v)
        .select(col("id")).collect().map(_.getInt(0)).toSet
      assert(ids(1) == Set(1, 2))
      assert(ids(2) == Set(1, 2, 3), "append accumulates")
      assert(ids(3) == Set(9), "overwrite replaces logically")
      // the overwrite never deleted bytes: version 2's files still exist
      assert(SnapshotStore.liveFiles(store, 2)
        .forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
      // a duplicate commit of the same version number fails loudly
      intercept[java.nio.file.FileAlreadyExistsException] {
        val m = classOf[SnapshotStore.type].getDeclaredMethods
          .find(_.getName == "commit").get
        m.setAccessible(true)
        try m.invoke(SnapshotStore, store, Int.box(3), Seq("x"), Seq.empty)
        catch {
          case e: java.lang.reflect.InvocationTargetException => throw e.getCause
        }
      }
    } finally {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("vacuum deletes exactly the files unreferenced past the horizon; " +
    "retained versions still read, pre-horizon snapshots are gone") {
    val root = java.nio.file.Files.createTempDirectory("snap-vacuum")
    val store = root.resolve("tbl").toString
    try {
      SnapshotStore.commitAppend(Seq((1, "a")).toDF("id", "v"), store)
      SnapshotStore.commitAppend(Seq((2, "b")).toDF("id", "v"), store)
      SnapshotStore.commitOverwrite(Seq((9, "z")).toDF("id", "v"), store)
      val v2Files = SnapshotStore.liveFiles(store, 2)
      val dead = SnapshotStore.vacuum(store, retainFrom = 3)
      assert(dead.toSet == v2Files.toSet,
        "exactly the files live only before the horizon are deleted")
      dead.foreach(p => assert(
        !java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
      // the retained version still reads in full
      assert(SnapshotStore.snapshotAt(spark, store, 3)
        .select(col("id")).collect().map(_.getInt(0)).toSet == Set(9))
      // a vacuumed-away snapshot fails loudly (Spark checks the paths at
      // read-analysis time already), never silently returns partial data
      intercept[Exception] {
        SnapshotStore.snapshotAt(spark, store, 2).collect()
      }
      // a PENDING write-audit-publish branch survives a racing vacuum —
      // its files are referenced by no committed version yet, so the walk
      // must exclude _staging; the branch then publishes intact
      val staged = SnapshotStore.stageBranch(
        Seq((7, "p")).toDF("id", "v"), store, "pending")
      val dead2 = SnapshotStore.vacuum(store, retainFrom = 3)
      assert(dead2.isEmpty, s"vacuum must not touch _staging: $dead2")
      staged.foreach(p => assert(
        java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
      val v = SnapshotStore.publishBranch(store, "pending")
      assert(SnapshotStore.snapshotAt(spark, store, v)
        .select(col("id")).collect().map(_.getInt(0)).toSet == Set(9, 7))
    } finally {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("shallow clone copies no bytes and diverges independently") {
    val root = java.nio.file.Files.createTempDirectory("clone-spec")
    val src = root.resolve("src").toString
    val tgt = root.resolve("tgt").toString
    try {
      SnapshotStore.commitAppend(Seq((1, "a"), (2, "b")).toDF("id", "v"), src)
      def parquetCount(p: String): Long = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
        finally s.close()
      }
      val before = parquetCount(root.toString)
      SnapshotStore.cloneShallow(src, tgt)
      assert(parquetCount(root.toString) == before,
        "clone must create no data files")
      assert(SnapshotStore.liveFiles(tgt, 1).toSet ==
        SnapshotStore.liveFiles(src, 1).toSet, "clone references source files")
      // divergence: writes to one never show in the other
      SnapshotStore.commitAppend(Seq((3, "c")).toDF("id", "v"), tgt)
      SnapshotStore.commitAppend(Seq((9, "z")).toDF("id", "v"), src)
      def ids(store: String) = SnapshotStore.snapshotAt(spark, store,
          SnapshotStore.currentVersion(store))
        .select(col("id")).collect().map(_.getInt(0)).toSet
      assert(ids(tgt) == Set(1, 2, 3) && ids(src) == Set(1, 2, 9))
      // a clone over a non-empty target refuses
      intercept[IllegalArgumentException] {
        SnapshotStore.cloneShallow(src, tgt)
      }
    } finally {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("write-audit-publish: staged data is invisible, publish is " +
    "metadata-only, discard leaves the table bit-identical") {
    val root = java.nio.file.Files.createTempDirectory("wap-spec")
    val store = root.resolve("tbl").toString
    try {
      SnapshotStore.commitAppend(Seq((1, "a")).toDF("id", "v"), store)
      // stage: no new version, current snapshot unchanged
      val staged = SnapshotStore.stageBranch(
        Seq((2, "b"), (3, "c")).toDF("id", "v"), store, "br")
      assert(SnapshotStore.currentVersion(store) == 1)
      assert(SnapshotStore.snapshotAt(spark, store, 1).count() == 1,
        "staged rows must be invisible to readers")
      // audit reads exactly the staged bytes
      assert(SnapshotStore.readBranch(spark, store, "br").count() == 2)
      // publish: metadata-only — the committed version references the
      // SAME files the stage wrote (no data movement)
      val v2 = SnapshotStore.publishBranch(store, "br")
      assert(v2 == 2 && SnapshotStore.liveFiles(store, 2).toSet
        .intersect(staged.toSet) == staged.toSet)
      assert(SnapshotStore.snapshotAt(spark, store, 2)
        .select(col("id")).collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
      // failed audit: discard leaves every version exactly as it was
      SnapshotStore.stageBranch(Seq((99, "bad")).toDF("id", "v"),
        store, "bad-br")
      SnapshotStore.discardBranch(store, "bad-br")
      assert(SnapshotStore.currentVersion(store) == 2)
      assert(SnapshotStore.snapshotAt(spark, store, 2).count() == 3)
      intercept[IllegalArgumentException] {
        SnapshotStore.publishBranch(store, "bad-br") // gone after discard
      }
    } finally {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("incremental read: (from, to] appends only, net of in-window " +
    "removes; bad windows fail loudly") {
    val root = java.nio.file.Files.createTempDirectory("snap-inc")
    val store = root.resolve("tbl").toString
    try {
      SnapshotStore.commitAppend(Seq((1, "a")).toDF("id", "v"), store) // v1
      SnapshotStore.commitAppend(Seq((2, "b")).toDF("id", "v"), store) // v2
      SnapshotStore.commitAppend(Seq((3, "c")).toDF("id", "v"), store) // v3
      SnapshotStore.commitOverwrite(Seq((9, "z")).toDF("id", "v"), store) // v4
      def ids(from: Int, to: Int) =
        SnapshotStore.readIncremental(spark, store, from, to)
          .select(col("id")).collect().map(_.getInt(0)).toSet
      assert(ids(1, 3) == Set(2, 3), "appends inside the window")
      assert(ids(0, 2) == Set(1, 2), "from=0 reads from table birth")
      assert(ids(2, 4) == Set(9),
        "v3's batch is added in-window but dead at v4 — net changes")
      assert(ids(3, 4) == Set(9))
      // historical windows read against the state AT to, not latest
      assert(ids(1, 2) == Set(2))
      // out-of-range or empty windows fail loudly
      intercept[IllegalArgumentException](ids(4, 4))
      intercept[IllegalArgumentException](ids(2, 5))
      SnapshotStore.commitOverwrite(Seq((10, "y")).toDF("id", "v"), store)
      assert(ids(1, 5) == Set(10),
        "every pre-overwrite in-window append is dead at v5")
      assert(ids(4, 5) == Set(10))
    } finally {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }
}
