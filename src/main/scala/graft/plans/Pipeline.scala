package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's end-to-end ETL lifecycle (SURVEY §3 E2,
  * /root/reference/etl/etl_ida.py:732-834) as one engine call:
  * raw wide sheets -> transform -> normalized records -> idempotent fact
  * load, returning the audit counters the reference logs per run
  * (resources processed / extracted / transformed / loaded / errors —
  * etl_ida.py:743-749,793-818).
  *
  * Differences from the reference, by design:
  *  - per-sheet sequential Python loops become one unioned lazy plan; the
  *    union is a narrow bag-union (U1), so Spark parallelizes across
  *    sheets AND rows;
  *  - the memory-bounded flush every batch_size*5 records disappears —
  *    Spark's task model owns memory;
  *  - "loaded == 0 while transformed > 0" is an error in the reference
  *    (etl_ida.py:849-851) only on a fresh store; on re-runs it is exactly
  *    the idempotency contract working, so it is reported, not thrown.
  */
object Pipeline {

  case class RunStats(resources: Int, extracted: Long, transformed: Long,
                      loadedNew: Long, errors: Seq[String])

  def run(spark: SparkSession, wides: Seq[DataFrame],
          factPath: String): RunStats = {
    // NonFatal, not just the month-column require: a malformed sheet throws
    // AnalysisException at (eager) plan analysis, a vanished/corrupt file
    // throws at the count. Each sheet's transform AND its first execution
    // are inside the try so one bad resource is reported and skipped, never
    // aborting the run (etl_ida.py:793-818). The per-sheet count doubles as
    // the reference's extracted-rows audit counter (raw input is scanned
    // once for audit + once for the load — the reference pays the same).
    val (sheets, errors) = wides.zipWithIndex.foldLeft(
      (Seq.empty[(DataFrame, Long)], Seq.empty[String])) {
      case ((ok, errs), (wide, i)) =>
        try {
          val recs = IdaTransform.rawWideToRecords(wide)
          (ok :+ (recs, wide.count()), errs)
        } catch {
          case scala.util.control.NonFatal(e) =>
            (ok, errs :+ s"sheet $i: ${e.getMessage}")
        }
    }
    if (sheets.isEmpty)
      return RunStats(wides.size, 0L, 0L, 0L, errors)

    val extracted = sheets.map(_._2).sum
    val records = sheets.map(_._1).reduce(_ unionByName _)      // U1
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fact = IdaMart.fact(records)
      val existing = IdaMart.readStoreIfExists(spark, factPath)
      val fresh = (existing match {
        case Some(ex) => IdaMart.load(ex, fact)
        case None     => fact
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // persisted: counted once for stats, then appended — without the
      // persist the whole transform+fact DAG would execute twice
      val loaded = fresh.count()
      if (loaded > 0 || existing.isEmpty)
        fresh.write.mode("append").parquet(factPath)
      fresh.unpersist()
      val transformed = records.count()
      // the reference's invariant tests TRANSFORMED rows (etl_ida.py:849-851)
      // — extracted rows that were all legitimately filtered are a clean run
      val freshStoreEmptyLoad =
        if (existing.isEmpty && loaded == 0 && transformed > 0)
          Seq("transformed records but loaded none into a fresh store")
        else Nil
      RunStats(wides.size, extracted, transformed, loaded,
        errors ++ freshStoreEmptyLoad)
    } finally records.unpersist()
  }
}
