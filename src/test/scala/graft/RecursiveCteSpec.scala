package graft

/** WITH RECURSIVE through the SQL front door: Spark 4.x plans the
  * recursion as UnionLoop, and the result is equivalent to the
  * non-recursive `sequence()` restatement — pinning both the feature's
  * availability and its semantics for the `f_recursive_cte` gate. */
class RecursiveCteSpec extends SparkSpec {

  test("recursive CTE executes and plans as UnionLoop") {
    val df = spark.sql(
      """WITH RECURSIVE t AS (
        |  SELECT 1 AS n
        |  UNION ALL
        |  SELECT n + 1 FROM t WHERE n < 5
        |)
        |SELECT n FROM t ORDER BY n""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("UnionLoop"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("recursive month spine equals the sequence() spine") {
    val rec = spark.sql(
      """WITH RECURSIVE spine AS (
        |  SELECT DATE '1996-01-01' AS month_start
        |  UNION ALL
        |  SELECT month_start + INTERVAL 1 MONTH FROM spine
        |  WHERE month_start < DATE '1997-12-01'
        |)
        |SELECT month_start FROM spine""".stripMargin)
    val seq = spark.sql(
      """SELECT explode(sequence(DATE '1996-01-01', DATE '1997-12-01',
        |  INTERVAL 1 MONTH)) AS month_start""".stripMargin)
    assert(rec.count() == 24)
    assert(rec.exceptAll(seq).isEmpty && seq.exceptAll(rec).isEmpty)
  }

  test("recursion terminates by predicate, not by the level-limit guard") {
    // 24 iterations sit far below spark.sql.cteRecursionLevelLimit
    // (default 100) — the gate's spine never rides the safety rail
    val limit = spark.conf.get("spark.sql.cteRecursionLevelLimit").toInt
    assert(limit >= 24)
  }
}
