package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions backing the SCALE.md claims of the round-14
  * gates — the [[Batch3PlanShapeSpec]] discipline continued: what the
  * docs say about broadcasts, exchanges, and scan counts must be visible
  * in the plan, not just asserted in prose. Counts run on the
  * pre-execution plan string (AQE's final plan hides earlier query
  * stages behind stage references). */
class Batch4PlanShapeSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    needle.r.findAllIn(plan).size

  test("corpus_dsir_diag_w12: the respun integer spine still broadcasts " +
    "the <=256-row model into the per-doc weight join — the corpus-sized " +
    "cell frame is never shuffled on bucket") {
    val plan = planOf(
      SparkEntry.queries("corpus_dsir_diag_w12")(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") >= 1, plan)
  }

  test("corpus_dsir_diag_cells: pure per-doc folds of the checkpointed " +
    "cell grid — no join, one aggregate exchange on doc_id") {
    val plan = planOf(
      SparkEntry.queries("corpus_dsir_diag_cells")(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") == 0, plan)
    assert(count(plan, "Exchange hashpartitioning") <= 1, plan)
  }

  test("corpus_curriculum_diag_hist: one aggregate exchange to the " +
    "score-domain frame; the single-partition window runs on that " +
    "bounded frame, not the corpus") {
    val plan = planOf(
      SparkEntry.queries("corpus_curriculum_diag_hist")(spark, sf0001))
    assert(plan.contains("Window"), plan)
    // hash exchanges: the score histogram, plus the constant-key window
    // repartition — both over the <=|score domain| frame
    assert(count(plan, "Exchange hashpartitioning") <= 2, plan)
  }

  test("a_cohens_kappa: the |langs|-sized marginal product broadcasts " +
    "into the final row; the corpus is scanned once (into the " +
    "checkpointed confusion cells)") {
    val plan = planOf(SparkEntry.queries("a_cohens_kappa")(spark, sf0001))
    assert(count(plan, "BroadcastNestedLoopJoin|BroadcastHashJoin") >= 1, plan)
    assert(count(plan, "Scan parquet") == 0, // cells are checkpointed
      plan)
  }

  test("corpus_token_budget: the per-lang frame is checkpointed once " +
    "(zero parquet scans in the served plan); the one-row weight total " +
    "broadcasts back") {
    val plan = planOf(
      SparkEntry.queries("corpus_token_budget")(spark, sf0001))
    assert(count(plan, "Scan parquet|FileScan parquet") == 0, plan)
    assert(count(plan, "BroadcastNestedLoopJoin") >= 1, plan)
  }

  test("multimodal_wav_metadata_strip: no exchange below the output " +
    "sort — the scrub is embarrassingly parallel like its PNG sibling") {
    val gate =
      SparkEntry.queries("multimodal_wav_metadata_strip")(spark, sf0001)
    assert(count(planOf(gate), "Exchange hashpartitioning") == 0,
      planOf(gate))
  }
}
