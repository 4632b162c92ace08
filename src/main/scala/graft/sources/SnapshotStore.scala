package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-isolated table with TIME TRAVEL — the transaction-log
  * core of the lakehouse formats (Delta's _delta_log, Iceberg's snapshot
  * list) distilled to its invariant: data files are IMMUTABLE; a commit
  * is one atomically-published log entry listing files ADDED and files
  * logically REMOVED; reading "as of" version v replays log entries
  * 1..v into a live-file set and scans exactly those files. Overwrites
  * and deletes never touch bytes on disk — old versions stay readable
  * until a retention job physically vacuums unreferenced files.
  *
  * Scale shape: the log is PLANNER metadata (one small file per commit,
  * |files| total entries — the [[StatsManifest]] contract); replay is a
  * driver-side fold over it, and the data path is an ordinary
  * multi-file parquet scan of the live set. Commit atomicity here is the
  * single-file create (`CREATE_NEW` — a half-written commit is never
  * visible under a numbered-file protocol, the same property Delta gets
  * from atomic rename); multi-writer coordination needs the real
  * formats' conditional-put and is out of scope. */
object SnapshotStore {

  private def logDir(store: String): Path = Paths.get(store, "_log")
  private def dataDir(store: String, v: Int): Path =
    Paths.get(store, f"data-v$v%05d")

  private def listVersions(store: String): Seq[Int] = {
    val d = logDir(store)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.toSeq
        .map(_.getFileName.toString)
        .filter(_.endsWith(".commit"))
        .map(_.stripSuffix(".commit").toInt).sorted
      finally s.close()
    }
  }

  /** Latest committed version (0 = empty table). */
  def currentVersion(store: String): Int =
    listVersions(store).lastOption.getOrElse(0)

  private def commit(store: String, v: Int, adds: Seq[String],
                     removes: Seq[String]): Unit = {
    Files.createDirectories(logDir(store))
    val body = (adds.map(p => s"A\t$p") ++ removes.map(p => s"R\t$p"))
      .mkString("\n")
    // CREATE_NEW: the commit file appears fully written or not at all,
    // and a concurrent committer of the same version fails loudly
    Files.write(logDir(store).resolve(f"$v%05d.commit"),
      body.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
  }

  private def writeData(df: DataFrame, store: String, v: Int): Seq[String] = {
    val dir = dataDir(store, v)
    df.write.mode("errorifexists").parquet(dir.toString)
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    finally s.close()
  }

  /** Append `df` as a new version; returns the committed version. */
  def commitAppend(df: DataFrame, store: String): Int = {
    val v = currentVersion(store) + 1
    commit(store, v, writeData(df, store, v), Seq.empty)
    v
  }

  /** Replace the table contents with `df` (logical overwrite: prior
    * versions stay readable); returns the committed version. */
  def commitOverwrite(df: DataFrame, store: String): Int = {
    val v = currentVersion(store) + 1
    val removed = liveFiles(store, v - 1)
    commit(store, v, writeData(df, store, v), removed)
    v
  }

  /** The live file set as of `version` — the log replay. */
  def liveFiles(store: String, version: Int): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    listVersions(store).filter(_ <= version).foreach { v =>
      Files.readAllLines(logDir(store).resolve(f"$v%05d.commit"))
        .asScala.filter(_.nonEmpty).foreach { line =>
          val Array(action, path) = line.split("\t", 2)
          if (action == "A") live += path else live -= path
        }
    }
    live.toSeq
  }

  /** Retention: physically delete data files referenced by NO version >=
    * `retainFrom` — the vacuum that bounds storage after overwrites and
    * erasures (until it runs, every byte ever committed persists, which
    * is what makes time travel work; after it runs, versions before the
    * horizon are gone for good — including for GDPR purposes, where the
    * vacuum IS the point). Returns the deleted file paths. */
  def vacuum(store: String, retainFrom: Int): Seq[String] = {
    val latest = currentVersion(store)
    require(retainFrom >= 1 && retainFrom <= latest,
      s"vacuum: retainFrom $retainFrom out of [1, $latest]")
    val keep = (retainFrom to latest)
      .flatMap(v => liveFiles(store, v)).toSet
    val root = Paths.get(store)
    // _staging holds pending write-audit-publish branches whose files are
    // BY DESIGN referenced by no committed version yet — a vacuum racing a
    // pending branch must not delete the staged batch out from under its
    // publishBranch (abandoned branches are reclaimed via discardBranch)
    val staging = root.resolve("_staging")
    val s = Files.walk(root)
    val all =
      try s.iterator().asScala.toSeq
        .filter(p => Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet") && !p.startsWith(staging))
        .map(_.toString).sorted
      finally s.close()
    val dead = all.filterNot(keep.contains)
    dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
    dead
  }

  /** Read the table AS OF `version` (time travel). Version 0 and any
    * fully-overwritten-away snapshot read as an empty frame is not
    * representable without a schema — callers read versions >= 1. */
  def snapshotAt(spark: SparkSession, store: String, version: Int): DataFrame = {
    val files = liveFiles(store, version)
    require(files.nonEmpty,
      s"snapshotAt: version $version of $store has no live files")
    spark.read.parquet(files: _*)
  }

  /** INCREMENTAL READ between snapshots (Iceberg's incremental append
    * scan / the append rows of Delta's change data feed): the rows a
    * downstream consumer that last saw `fromVersion` must process to
    * catch up to `toVersion`. Resolved ENTIRELY from the log — the files
    * ADDED by commits in (fromVersion, toVersion] that are still live at
    * `toVersion` (a file added and logically removed inside the window
    * contributed nothing to the `toVersion` snapshot, exactly Iceberg's
    * net-changes rule) — then scanned as an ordinary multi-file parquet
    * read. Cost is the appended bytes, NEVER a diff of two snapshots:
    * the log replay is driver-side metadata (|files| entries), which is
    * what makes catch-up consumption viable on a 100 TB table where the
    * snapshot itself is too large to re-read. Returns an empty-schema
    * failure only if the window adds nothing — callers polling an
    * append-only table should check [[currentVersion]] first. */
  def readIncremental(spark: SparkSession, store: String,
                      fromVersion: Int, toVersion: Int): DataFrame = {
    val latest = currentVersion(store)
    require(fromVersion >= 0 && fromVersion < toVersion && toVersion <= latest,
      s"readIncremental: window ($fromVersion, $toVersion] out of range " +
        s"(latest $latest)")
    val live = liveFiles(store, toVersion).toSet
    val added = listVersions(store)
      .filter(v => v > fromVersion && v <= toVersion)
      .flatMap { v =>
        Files.readAllLines(logDir(store).resolve(f"$v%05d.commit"))
          .asScala.filter(_.nonEmpty).collect {
            case line if line.startsWith("A\t") => line.split("\t", 2)(1)
          }
      }
      .filter(live.contains)
    require(added.nonEmpty,
      s"readIncremental: ($fromVersion, $toVersion] adds no live files")
    spark.read.parquet(added: _*)
  }

  // ----- WRITE-AUDIT-PUBLISH (the Iceberg WAP / Delta shadow-branch
  // workflow): stage a batch's data files OUTSIDE the log (invisible to
  // every reader), run arbitrary audits against the staged files, then
  // either PUBLISH — one metadata-only log commit referencing the staged
  // files, no data movement — or DISCARD. The full batch write happens
  // before any reader can observe a row, which is the whole point: a
  // failed audit leaves the table bit-identical.

  /** ZERO-COPY SHALLOW CLONE (Delta `CLONE`): the clone's first commit
    * references the SOURCE's live data files — no bytes move, clone cost
    * is one log entry whatever the table size. Subsequent commits to
    * either table diverge independently (immutable files are never
    * rewritten, so sharing is safe); physical lifetime of shared files
    * is governed by the SOURCE's vacuum, the real formats' caveat. */
  def cloneShallow(source: String, target: String,
                   asOfVersion: Int = -1): Int = {
    val v = if (asOfVersion >= 1) asOfVersion else currentVersion(source)
    val files = liveFiles(source, v)
    require(files.nonEmpty, s"cloneShallow: nothing to clone at v$v")
    require(currentVersion(target) == 0,
      s"cloneShallow: target $target is not empty")
    commit(target, 1, files, Seq.empty)
    1
  }

  /** Stage `df` on `branch` without committing: files land under
    * `_staging/<branch>` and no log entry references them. */
  def stageBranch(df: DataFrame, store: String, branch: String): Seq[String] = {
    val dir = Paths.get(store, "_staging", branch)
    df.write.mode("errorifexists").parquet(dir.toString)
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    finally s.close()
  }

  /** Read a staged branch (the audit's input — exactly the bytes that
    * would publish). */
  def readBranch(spark: SparkSession, store: String,
                 branch: String): DataFrame =
    spark.read.parquet(Paths.get(store, "_staging", branch).toString)

  /** Atomically publish a staged branch as the next version: ONE commit
    * file referencing the already-written staged files — metadata-only,
    * no data movement, and the CREATE_NEW commit protocol makes the
    * publish all-or-nothing. */
  def publishBranch(store: String, branch: String): Int = {
    val dir = Paths.get(store, "_staging", branch)
    require(Files.exists(dir), s"publishBranch: no staged branch $branch")
    val s = Files.list(dir)
    val files =
      try s.iterator().asScala.toSeq.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted
      finally s.close()
    require(files.nonEmpty, s"publishBranch: branch $branch has no files")
    val v = currentVersion(store) + 1
    commit(store, v, files, Seq.empty)
    v
  }

  /** Drop a staged branch after a failed audit: the table never saw it.
    * (An abandoned branch is also reclaimed by [[vacuum]], which keeps
    * only log-referenced files.) */
  def discardBranch(store: String, branch: String): Unit = {
    val dir = Paths.get(store, "_staging", branch)
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }
}
