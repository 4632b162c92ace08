package graft

/** Plan-inspection tool: prints the formatted physical plan of each named
  * query (or all of them) so scan pruning (`PushedFilters`, `ReadSchema`),
  * join strategies (broadcast vs shuffle) and whole-stage-codegen spans can
  * be audited per change. Usage: runMain graft.Explain [sfDir] [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Session.build(appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n================ $name ================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
