package graft

import org.apache.spark.scheduler._

/** Temporary diagnostic main for the 32-core overhead regime (round 18).
  * Runs one gate repeatedly with a listener that aggregates per-job wall
  * time, task counts and task time, then prints a summary. Not a gate.
  */
object Probe32 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val gate = sys.env.getOrElse("PROBE_GATE", "graph_pagerank")
    val spark = Session.build(appName = "graft-probe")
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var jobWallMs = 0L
    @volatile var stages = 0
    @volatile var runMs = 0L      // executor run time
    @volatile var deserMs = 0L    // task binary deserialization
    @volatile var gcMs = 0L       // JVM GC charged to tasks
    @volatile var cpuMs = 0L      // executor CPU time (ns -> ms)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageRows =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, System.nanoTime()); jobs += 1
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(je.jobId)).foreach { t0 =>
          jobWallMs += (System.nanoTime() - t0) / 1000000
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        stageRows.add((si.stageId, si.numTasks, wall, si.name.take(60)))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskInfo != null) taskTimeMs += te.taskInfo.duration
        if (te.taskMetrics != null) {
          runMs += te.taskMetrics.executorRunTime
          deserMs += te.taskMetrics.executorDeserializeTime
          gcMs += te.taskMetrics.jvmGCTime
          cpuMs += te.taskMetrics.executorCpuTime / 1000000
        }
      }
    }

    val fn = SparkEntry.queries(gate)
    // warmup (staging + JIT)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.addSparkListener(listener)
    val iters = sys.env.get("PROBE_ITERS").map(_.toInt).getOrElse(3)
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the listener bus drain
      println(f"[probe] iter=$i wall=$wall%.3f s cumulative: jobs=$jobs stages=$stages tasks=$tasks taskTimeMs=$taskTimeMs jobWallMs=$jobWallMs runMs=$runMs cpuMs=$cpuMs deserMs=$deserMs gcMs=$gcMs")
      i += 1
    }
    import scala.jdk.CollectionConverters._
    stageRows.asScala.toSeq.sortBy(-_._3).take(15).foreach {
      case (id, n, wall, name) =>
        println(f"[stage] id=$id%5d tasks=$n%3d wallMs=$wall%5d $name")
    }
    spark.stop()
  }
}
