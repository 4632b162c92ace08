package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions backing the SCALE.md claims of the round-13
  * gates: what the docs say about broadcasts, exchanges, and scan counts
  * must be visible in the plan, not just asserted in prose. Counts run on
  * the pre-execution plan string (the ProfileSpec discipline — AQE's
  * final plan hides earlier query stages behind stage references). */
class Batch3PlanShapeSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    needle.r.findAllIn(plan).size

  test("split_leakage_audit: both pair-side joins broadcast — the " +
    "corpus-sized split frame is never hash-shuffled for the join") {
    val plan = planOf(SparkEntry.queries("split_leakage_audit")(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") >= 2, plan)
  }

  test("tokenizer_fertility: the corpus is shuffled once (the ~|langs| " +
    "aggregate); only the final ORDER adds a range exchange") {
    val plan = planOf(SparkEntry.queries("tokenizer_fertility")(spark, sf0001))
    assert(count(plan, "Exchange hashpartitioning") == 1, plan)
    assert(count(plan, "Scan parquet") == 1, plan)
  }

  test("a_bootstrap_poisson: all 32 resamples off ONE scan, one " +
    "aggregate exchange — no per-resample passes") {
    val plan = planOf(SparkEntry.queries("a_bootstrap_poisson")(spark, sf0001))
    assert(count(plan, "Scan parquet") == 1, plan)
    assert(count(plan, "Exchange hashpartitioning") <= 1, plan)
  }

  test("corpus_curriculum: the stage map joins back as a broadcast — " +
    "the corpus is never shuffled on score") {
    val plan = planOf(SparkEntry.queries("corpus_curriculum")(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") >= 1, plan)
  }

  test("text_keyphrase_rake: the word-score frame broadcasts into the " +
    "member join") {
    val plan = planOf(SparkEntry.queries("text_keyphrase_rake")(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") >= 1, plan)
  }

  test("multimodal_metadata_strip: no exchange anywhere below the " +
    "output sort — the scrub is embarrassingly parallel") {
    val gate = SparkEntry.queries("multimodal_metadata_strip")(spark, sf0001)
    val plan = planOf(gate)
    assert(count(plan, "Exchange hashpartitioning") == 0, plan)
  }
}
