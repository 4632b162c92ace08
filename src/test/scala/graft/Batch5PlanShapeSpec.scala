package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions backing the SCALE.md claims of the round-15
  * extension gates — the [[Batch4PlanShapeSpec]] discipline continued.
  * The load-bearing claims: every pair/rank statistic runs its quadratic
  * or windowed stage on a BOUNDED aggregated frame with the corpus
  * scanned exactly once (the dual-consumer checkpoint — the probe that
  * found kendall/acf/cross-corr at 2 scans and kruskal at 3 before the
  * fix), and the function-family / pseudonymization gates are single-scan
  * narrow projections with no exchange at all. */
class Batch5PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    needle.r.findAllIn(plan).size

  test("kendall/acf/cross-corr: the corpus is scanned ONCE into the " +
    "checkpointed daily frame; the pair join is broadcast on the " +
    "calendar-bounded side; one aggregate exchange") {
    for (q <- Seq("a_kendall_tau", "ts_acf", "ts_cross_corr")) {
      val p = planOf(q)
      assert(count(p, "Scan parquet|FileScan parquet") == 0, s"$q\n$p")
      assert(count(p, "BroadcastHashJoin") >= 1, s"$q\n$p")
      assert(count(p, "Exchange hashpartitioning") <= 1, s"$q\n$p")
    }
  }

  test("a_kruskal_wallis: one corpus scan into the checkpointed (v, g) " +
    "frame; rank join broadcast; every further exchange is over the " +
    "bounded distinct-value frame") {
    val p = planOf("a_kruskal_wallis")
    assert(count(p, "Scan parquet|FileScan parquet") == 0, p)
    assert(count(p, "BroadcastHashJoin") >= 1, p)
    assert(count(p, "Exchange hashpartitioning") <= 3, p)
  }

  test("a_gini: one scan, one rank window, one aggregate exchange — " +
    "no join anywhere") {
    val p = planOf("a_gini")
    assert(count(p, "Scan parquet|FileScan parquet") == 1, p)
    assert(p.contains("Window"), p)
    assert(count(p, "Exchange hashpartitioning") <= 1, p)
    assert(count(p, "Join") == 0, p)
  }

  test("function families + pseudonymization: single-scan narrow " +
    "projections, zero hash exchange (only the output sort)") {
    for (q <- Seq("f_math_family", "f_array_family", "f_timestamp_family",
                  "privacy_pseudonymize")) {
      val p = planOf(q)
      assert(count(p, "Scan parquet|FileScan parquet") == 1, s"$q\n$p")
      assert(count(p, "Exchange hashpartitioning") == 0, s"$q\n$p")
      assert(count(p, "Join") == 0, s"$q\n$p")
    }
  }

  test("graph_scc_condensation: the component lift joins the gated scc " +
    "ids to the edge list — broadcast or shuffled equi-joins only, " +
    "never a nested-loop pair blowup") {
    val p = planOf("graph_scc_condensation")
    assert(count(p, "BroadcastNestedLoopJoin|CartesianProduct") == 0, p)
  }

  test("a_wilcoxon: one corpus scan into the checkpointed daily frame; " +
    "the pair join and rank window run on the bounded day-domain") {
    val p = planOf("a_wilcoxon")
    assert(count(p, "Scan parquet|FileScan parquet") == 0, p)
    assert(p.contains("Window"), p)
    assert(count(p, "CartesianProduct") <= 1, p) // the 1-row stat cross
  }

  test("f_regex_family: single-scan zero-exchange projection like its " +
    "five sibling families") {
    val p = planOf("f_regex_family")
    assert(count(p, "Scan parquet|FileScan parquet") == 1, p)
    assert(count(p, "Exchange hashpartitioning") == 0, p)
  }

  test("graph_topo_levels: the served plan is the fixpoint's " +
    "checkpointed level frame — no parquet rescans, equi-joins only") {
    val p = planOf("graph_topo_levels")
    assert(count(p, "Scan parquet|FileScan parquet") == 0, p)
    assert(count(p, "BroadcastNestedLoopJoin|CartesianProduct") == 0, p)
  }
}
