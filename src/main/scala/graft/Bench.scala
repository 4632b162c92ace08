package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build(appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // JVM/JIT + parquet-footer warmup so measurements reflect steady-state
    // plan execution, not first-query class loading. Warmup failure (e.g.
    // missing smoke fixture) must not kill the benchmark itself.
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }
    // noop sink, NOT .count(): count() lets Catalyst prune projections and
    // sorts down to a zero-column metadata scan, so per-row expression work
    // would never execute; noop runs the full physical plan.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { exec(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.collect { case (k, v, true) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => jstr(k) }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
