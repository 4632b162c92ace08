package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, CountMin, Graph}

/** Bloom prefilter, count-min sketch, and triangle counting. */
class SketchJoinSpec extends SparkSpec {
  import spark.implicits._

  // ---------- Bloom ----------

  test("bloom prefilter is lossless: prefiltered join == plain join") {
    val probe = sources.Tables.orders(spark, sf0001)
    val build = sources.Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val pre = Bloom.prefilter(probe, "o_custkey", build, "c_custkey")
    val joined = pre.join(build, pre("o_custkey") === build("c_custkey"))
      .select(col("o_orderkey")).as[Long].collect().sorted
    val plain = probe.join(build, probe("o_custkey") === build("c_custkey"))
      .select(col("o_orderkey")).as[Long].collect().sorted
    assert(joined.sameElements(plain))
  }

  test("bloom prefilter actually drops non-member probe rows") {
    val probe = sources.Tables.orders(spark, sf0001)
    val build = sources.Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val kept = Bloom.prefilter(probe, "o_custkey", build, "c_custkey").count()
    val total = probe.count()
    // BUILDING is ~1/5 of customers; with k=3, m=4096 the false-positive
    // rate is well under 50%, so the prefilter must cut the probe side
    assert(kept < total, s"prefilter kept all $total rows")
  }

  test("bloom prefilter never false-negatives a planted member") {
    val build = Seq(7L, 42L, 99L).toDF("k")
    val probe = (0L until 200L).toDF("k")
    val kept = Bloom.prefilter(probe, "k", build, "k")
      .as[Long].collect().toSet
    assert(Set(7L, 42L, 99L).subsetOf(kept))
  }

  test("bloom prefilter ships the vector by broadcast, not shuffle") {
    val build = Seq(1L, 2L).toDF("k")
    val probe = (0L until 100L).toDF("k")
    val plan = Bloom.prefilter(probe, "k", build, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  // ---------- CountMin ----------

  test("count-min never undercounts and is exact without collisions") {
    val df = Seq.tabulate(300)(i => i % 7).toDF("k") // key i%7, 7 keys
    val grid = CountMin.sketch(df, "k", depth = 3, width = 1024)
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val est = CountMin.estimate(exact.select(col("k")), "k", grid, 3, 1024)
      .join(exact, Seq("k"))
      .select(col("n_exact"), col("cms_estimate"))
      .as[(Long, Long)].collect()
    assert(est.nonEmpty)
    // 7 keys into 1024 buckets x 3 lanes: collisions need two of 7 keys in
    // the same bucket in EVERY lane — with these fixed seeds they don't,
    // so the estimate is exact (and the >= guarantee holds trivially)
    est.foreach { case (ex, cms) => assert(cms === ex) }
  }

  test("count-min overcounts only: planted collision pressure") {
    val df = Seq.tabulate(500)(i => i % 100).toDF("k") // 100 keys, 5 each
    val grid = CountMin.sketch(df, "k", depth = 2, width = 8) // heavy collisions
    val keys = df.distinct()
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val est = CountMin.estimate(keys, "k", grid, 2, 8)
      .join(exact, Seq("k"))
      .select(col("n_exact"), col("cms_estimate"))
      .as[(Long, Long)].collect()
    assert(est.length === 100)
    est.foreach { case (ex, cms) => assert(cms >= ex) }
    // with 100 keys in 8 buckets, SOME estimate must exceed its true count
    assert(est.exists { case (ex, cms) => cms > ex })
  }

  test("count-min grid is bounded by depth*width regardless of input") {
    val df = Seq.tabulate(1000)(i => i.toLong).toDF("k") // 1000 distinct keys
    val grid = CountMin.sketch(df, "k", depth = 3, width = 16)
    assert(grid.count() <= 3 * 16)
  }

  // ---------- Graph ----------

  private def edges(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("src", "dst")

  test("triangle count: K4 has 4 triangles, a 4-cycle has none") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val (e1, t1) = Graph.triangleCount(k4)
      .as[(Long, Long)].collect().head
    assert(e1 === 6L && t1 === 4L)
    val cycle = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val (e2, t2) = Graph.triangleCount(cycle)
      .as[(Long, Long)].collect().head
    assert(e2 === 4L && t2 === 0L)
  }

  test("triangle count canonicalizes duplicates, reversals, self-loops") {
    val noisy = edges((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L))
    val (e, t) = Graph.triangleCount(noisy)
      .as[(Long, Long)].collect().head
    assert(e === 3L && t === 1L)
  }

  test("2-core peeling strips a tail chain down to the triangle " +
    "(cascading rounds), keeps a 4-cycle whole; layout-invariant") {
    // triangle {1,2,3} with tail 3-4-5: node 5 peels in round 1, node 4
    // (whose degree only then drops below 2) in round 2 — the cascade
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = Graph.kCore(g, k = 2, rounds = 3, aCol = "src", bCol = "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"2-core must be the triangle with in-core degrees 2: $got")
    // a 4-cycle is exactly 2-regular: nothing peels
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val keep = Graph.kCore(cyc, k = 2, rounds = 3, aCol = "src", bCol = "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // 3-core of the triangle+tail graph is empty
    assert(Graph.kCore(g, k = 3, rounds = 3, aCol = "src", bCol = "dst").collect().isEmpty)
    val again = Graph.kCore(g.repartition(7), k = 2, rounds = 3, aCol = "src", bCol = "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("jaccardSimilarity: closed-form overlaps on a known graph, " +
    "partition-invariant") {
    // star 1-{2,3,4} plus edge 2-3: N(1)={2,3,4}, N(2)={1,3}, N(3)={1,2},
    // N(4)={1}. Every pair sharing a neighbor, closed-form:
    // (1,2) share {3} J=1/(3+2-1)=1/4; (1,3) share {2} J=1/4;
    // (2,3) share {1} J=1/(2+2-1)=1/3; (2,4) share {1} J=1/(2+1-1)=1/2;
    // (3,4) share {1} J=1/2; (1,4) share nothing.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.jaccardSimilarity(g, minCommon = 1,
        aCol = "src", bCol = "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      (1L, 2L) -> (1L, 0.25),
      (1L, 3L) -> (1L, 0.25),
      (2L, 3L) -> (1L, 1.0 / 3.0),
      (2L, 4L) -> (1L, 0.5),
      (3L, 4L) -> (1L, 0.5)))
    assert(Graph.jaccardSimilarity(g, minCommon = 2,
      aCol = "src", bCol = "dst").collect().isEmpty)
    val again = Graph.jaccardSimilarity(g.repartition(5), minCommon = 1,
        aCol = "src", bCol = "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == again)
  }

  test("bfsHops: chain distances from the min-id source, bounded by " +
    "rounds, disconnected component unreachable, partition-invariant") {
    // chain 1-2-3-4-5-6 plus an island {10,11}; source = min id = 1
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("src", "dst")
    val got = Graph.bfsHops(g, rounds = 4, aCol = "src", bCol = "dst")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4),
      s"4 rounds reach exactly hop 4, never the island: $got")
    val again = Graph.bfsHops(g.repartition(5), rounds = 4,
        aCol = "src", bCol = "dst")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == again)
    // one more round reaches node 6; the island stays absent
    val more = Graph.bfsHops(g, rounds = 5, aCol = "src", bCol = "dst")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(more == got + (6L -> 5))
  }

  private def sccMap(g: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Graph.scc(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("scc: a directed cycle is one component, the reverse-orphan " +
    "chain stays singletons, DAG edges never merge") {
    // cycle 1->2->3->1; chain 3->4->5 (no way back); island pair 8<->9
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (8L, 9L), (9L, 8L)).toDF("src", "dst")
    val got = sccMap(g)
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 4, 5L -> 5,
      8L -> 8, 9L -> 8), s"got $got")
  }

  test("scc: direction matters — the undirected-looking diamond with " +
    "one reversed edge is all singletons; closing it makes one SCC") {
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    assert(sccMap(dag) == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
    val closed = dag.union(Seq((4L, 1L)).toDF("src", "dst"))
    assert(sccMap(closed) == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1))
  }

  test("scc: a high-id cycle UPSTREAM of a low-id cycle forces a second " +
    "peel round (its color floods the whole reach set, but only the " +
    "upstream cycle survives the backward pass); layout invariance") {
    // {5,6} cycle -> one-way -> {1,2} cycle: round 1 colors everything 6,
    // backward from 6 marks only {5,6}; {1,2} is assigned in round 2
    val g = Seq((5L, 6L), (6L, 5L), (5L, 1L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val got = sccMap(g)
    assert(got == Map(1L -> 1, 2L -> 1, 5L -> 5, 6L -> 5), s"got $got")
    assert(sccMap(g.repartition(7)) == got)
    // self-loops are inert
    assert(sccMap(g.union(Seq((2L, 2L)).toDF("src", "dst"))) == got)
  }

  private def lvlMap(g: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Graph.topoLevels(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("topoLevels: chain counts depth, diamond takes the LONGEST path, " +
    "a cycle raises instead of looping") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(lvlMap(chain) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    // diamond with a shortcut: d's level is the LONGEST path (a->b->d),
    // not the shortcut (a->d)
    val diamond = Seq((1L, 2L), (2L, 4L), (1L, 4L)).toDF("src", "dst")
    assert(lvlMap(diamond) == Map(1L -> 0, 2L -> 1, 4L -> 2))
    assert(lvlMap(diamond.repartition(5)) == lvlMap(diamond))
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e = intercept[Exception] { lvlMap(cyc) }
    assert(e.getMessage.contains("not a DAG"), e.getMessage)
  }

  test("topoLevels: empty edge list returns an empty frame (no NPE from " +
    "the null sum-over-zero-rows measure); explicit node universe " +
    "surfaces isolated nodes at level 0") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.topoLevels(none).collect().isEmpty)
    // isolated node 9 touches no edge: derived-universe drops it,
    // an explicit universe seeds it at level 0
    val chain = Seq((1L, 2L)).toDF("src", "dst")
    val universe = Seq(1L, 2L, 9L).toDF("n")
    assert(lvlMap(chain) == Map(1L -> 0, 2L -> 1))
    val seeded = Graph.topoLevels(chain, nodes0 = Some(universe)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seeded == Map(1L -> 0, 2L -> 1, 9L -> 0), s"got $seeded")
    // empty edges + universe: every node level 0
    val only = Graph.topoLevels(none, nodes0 = Some(universe)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(only == Map(1L -> 0, 2L -> 0, 9L -> 0), s"got $only")
  }
}
