package graft

// Temporary diagnostic: diff streamed vs batch tumbling agg on the fresh
// events fixture. Removed once the root cause is fixed.
object DebugStream {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventsStream
    val spark = Session.build(appName = "graft-debug")
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-dbg-in").toString
    graft.sources.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    println("files in staged dir: " + new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")))
    val agg = EventsStream.tumblingAgg(EventsStream.readEvents(spark, dir))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect()
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("window_start", "event_type").collect()
    println(s"streamed=${streamed.length} batch=${batch.length}")
    val s = streamed.map(_.toString).toSet
    val b = batch.map(_.toString).toSet
    println("in streamed only:"); (s -- b).toSeq.sorted.take(20).foreach(println)
    println("in batch only:"); (b -- s).toSeq.sorted.take(20).foreach(println)
    spark.stop()
  }
}
