package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: joining a day-partitioned fact with a
  * filtered dim must push a runtime subquery into the fact scan's
  * PartitionFilters, so non-qualifying partition directories are never
  * read — the mechanism the `s_dpp_prune` gate exercises. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("the fact scan carries a dynamicpruning partition filter") {
    val root = java.nio.file.Files.createTempDirectory("dpp").toString
    (1 to 100).map(i => (i.toLong, i % 10, i * 1.5))
      .toDF("id", "day", "value")
      .write.partitionBy("day").mode("overwrite").parquet(s"$root/fact")
    // the dim predicate must be a genuine comparison: a bare boolean
    // column simplifies to an attribute reference, which the DPP rule's
    // isLikelySelective test rejects (no subquery gets inserted)
    Seq((0, "pick"), (1, "pick"), (2, "pick"), (3, "skip"))
      .toDF("day", "tag")
      .write.mode("overwrite").parquet(s"$root/dim")

    val fact = spark.read.parquet(s"$root/fact")
    val dim = spark.read.parquet(s"$root/dim").filter(col("tag") === "pick")
    val joined = fact.join(dim.select(col("day")), Seq("day"))

    assert(spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled") == "true")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter, got:\n$plan")
    // semantics: only the 3 qualifying days' rows come back
    assert(joined.count() == 30)
  }
}
