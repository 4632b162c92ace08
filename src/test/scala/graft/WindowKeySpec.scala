package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Fns.singlePartitionKey: a deliberate single-partition window must keep a
  * NON-empty partition spec in the physical plan (empty spec = WindowExec's
  * "No Partition Defined" warning, which must stay reserved for accidental
  * global windows). */
class WindowKeySpec extends SparkSpec {
  import spark.implicits._

  test("singlePartitionKey window: same result as global window") {
    val df = Seq((3, 30.0), (1, 10.0), (2, 20.0)).toDF("k", "v")
    val w = Window.partitionBy(Fns.singlePartitionKey(col("k"))).orderBy(col("k"))
    val got = df.withColumn("prev", lag(col("v"), 1).over(w))
      .orderBy("k").collect().map(r => Option(r.get(2)))
    assert(got.toSeq == Seq(None, Some(10.0), Some(20.0)))
  }

  test("singlePartitionKey survives optimization (plan keeps partition spec)") {
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    val w = Window.partitionBy(Fns.singlePartitionKey(col("k"))).orderBy(col("k"))
    val out = df.withColumn("rn", row_number().over(w))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // a stripped (foldable) key would plan Exchange SinglePartition via
    // AllTuples — exactly the warning path; hashpartitioning proves the
    // spec survived
    assert(plan.contains("hashpartitioning"), s"partition key stripped:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), s"empty spec:\n$plan")
    // and the plain-lit control IS stripped — documents why hash() is used
    val wLit = Window.partitionBy(lit(0)).orderBy(col("k"))
    val outLit = df.withColumn("rn", row_number().over(wLit))
    assert(outLit.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"))
  }
}
