package graft

import graft.operators.Cluster

/** Connected-components clustering: transitive chains collapse to one
  * cluster under the minimum reachable id; disjoint pairs stay separate. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("chain A-B, B-C and separate D-E form two components with min reps") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Cluster.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path converges to one component (diameter > 2 rounds)") {
    val pairs = (1L until 12L).map(i => (i + 1, i)).toDF("a", "b") // reversed pairs
    val got = Cluster.connectedComponents(pairs).collect()
    assert(got.length == 12 && got.forall(_.getLong(1) == 1L))
  }

  test("chain deeper than maxIters falls back to star contraction and " +
    "still labels every node with the component min") {
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Cluster.connectedComponents(pairs, maxIters = 2).collect()
    assert(got.length == 20 && got.forall(_.getLong(1) == 1L))
  }

  test("star contraction: long path, cycle, self-loop and isolated pair " +
    "all label with the component min") {
    val pairs = ((1L until 30L).map(i => (i, i + 1)) ++
      Seq((50L, 51L), (51L, 52L), (52L, 50L), (60L, 60L), (70L, 71L)))
      .toDF("a", "b")
    val got = Cluster.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 30L).foreach(i => assert(got(i) == 1L, s"node $i"))
    assert(got(50L) == 50L && got(51L) == 50L && got(52L) == 50L)
    assert(got(60L) == 60L, "self-loop singleton labels itself")
    assert(got(70L) == 70L && got(71L) == 70L)
  }

  test("star contraction: string ids and empty input") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("a", "b")
    val got = Cluster.connectedComponentsStar(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Cluster.connectedComponentsStar(empty).collect().isEmpty)
  }

  test("property: star contraction matches union-find on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val n = 25 + trial * 15
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      val got = Cluster.connectedComponentsStar(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $got != $expected")
    }
  }

  test("pagerank: star hub outranks leaves, total mass conserved, " +
    "layout-independent") {
    // star: hub 1 connected to leaves 2..6, plus a detached pair 10-11
    val pairs = ((2L to 6L).map(i => (1L, i)) :+ (10L, 11L)).toDF("a", "b")
    val got = Cluster.pagerank(pairs, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 8) // hub + 5 leaves + detached pair
    val byId = got.map(t => t._1 -> t._3).toMap
    assert((2L to 6L).forall(l => byId(1L) > byId(l)),
      s"hub must outrank leaves: $byId")
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6,
      "with no dangling nodes total PageRank mass is conserved")
    assert(math.abs(byId(10L) - byId(11L)) < 1e-12,
      "symmetric pair must tie exactly")
    val again = Cluster.pagerank(pairs.repartition(7), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId == again, "rank values must be partition-layout invariant")
  }

  test("property: pagerank matches a naive driver-side reference on " +
    "random graphs (same rounds, same decimal carrier)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 30
      val pairs = (1 to 60).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val iters = 3
      // naive reference with the engine's exact arithmetic: per-round
      // contributions rounded into the DECIMAL(28,14) carrier, summed
      // exactly, teleport as the IEEE (1.0 - d) subtraction
      val edges = pairs.flatMap(p => Seq(p, p.swap)).distinct
      val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size }
      val nn = deg.size
      var pr: Map[Long, Double] = deg.map { case (k, _) => k -> 1.0 / nn }
      (1 to iters).foreach { _ =>
        val mass = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _) =>
            new java.math.BigDecimal(pr(src) / deg(src))
              .setScale(14, java.math.RoundingMode.HALF_UP)
          }.reduce(_.add(_))
        }
        pr = pr.map { case (k, _) =>
          k -> ((1.0 - 0.85) / nn + 0.85 * mass(k).doubleValue())
        }
      }
      val got = Cluster.pagerank(pairs.toDF("a", "b"), iters = iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.keySet == pr.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - pr(k)) < 1e-9, s"node $k: engine $v vs ref ${pr(k)}")
      }
    }
  }

  test("empty pair set yields empty components without iterating") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Cluster.connectedComponents(pairs).collect().isEmpty)
  }

  test("cycle terminates and labels with the min member") {
    val pairs = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("a", "b")
    val got = Cluster.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("string ids: diameter-3 chain converges correctly (join-based probe)") {
    // regression: the decimal-sum convergence probe NULLs out on string ids
    // and would declare convergence after round 1, leaving "d" labeled "c"
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("a", "b")
    val got = Cluster.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("property: matches brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 20 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference: path-compressed union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      val got = Cluster.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $got != $expected")
    }
  }

  test("label propagation: bridged triangles form two communities where " +
    "CC would merge them; layout-invariant") {
    // two triangles joined by a single bridge edge — one connected
    // component, but two dense communities
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val got = Cluster.labelPropagation(pairs, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 6)
    val lab = got.map(t => t._1 -> t._2).toMap
    assert(lab(1L) == lab(2L) && lab(2L) == lab(3L))
    assert(lab(10L) == lab(11L) && lab(11L) == lab(12L))
    assert(lab(1L) != lab(10L),
      s"bridge must not merge the communities: $lab")
    got.foreach { case (id, l, sz) =>
      assert(sz == 3L, s"node $id community $l size $sz") }
    // CC on the same graph yields ONE cluster — the signal LPA adds
    val cc = Cluster.connectedComponents(pairs).collect()
    assert(cc.forall(_.getLong(1) == 1L))
    val again = Cluster.labelPropagation(pairs.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == again.toSet,
      "labels must be partition-layout invariant")
  }

  test("property: label propagation matches a naive synchronous reference " +
    "on random graphs (same rounds, same argmax tie-break)") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 3) {
      val n = 25 + trial * 10
      val pairs = Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val iters = 3
      val edges = pairs.flatMap(p => Seq(p, p.swap)).distinct
      val nbrs = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      var lab: Map[Long, Long] = nbrs.keys.map(k => k -> k).toMap
      (1 to iters).foreach { _ =>
        lab = nbrs.map { case (v, ns) =>
          val counts = ns.groupBy(lab).map { case (l, xs) => l -> xs.size }
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      val got = Cluster.labelPropagation(pairs.toDF("a", "b"), iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lab, s"trial $trial: $got != $lab")
    }
  }

  test("hits: star-graph walk counts hand-checked; scores are exact " +
    "integers, template node dominates") {
    // star: 0-1, 0-2, 0-3. a1=deg (center 3, leaf 1); h1 = A a1 (center 3,
    // leaf 3); a2 = A h1 (center 9, leaf 3); h2 = A a2 (center 9, leaf 9)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val got = Cluster.hits(pairs, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((3L, 9L, 9L)))
    Seq(1L, 2L, 3L).foreach(l => assert(got(l) == ((1L, 3L, 9L))))
    // brute-force parity on a random graph: a_2 = A^3·1, h_2 = A^4·1
    val rnd = new scala.util.Random(7)
    val edges = (0 until 30).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      .filter(p => p._1 != p._2).distinct
    val adj = edges.flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def mul(v: Map[Long, Long]): Map[Long, Long] =
      adj.map { case (n, ns) => n -> ns.map(m => v.getOrElse(m, 0L)).sum }
    val ones = adj.keys.map(_ -> 1L).toMap
    val a2 = mul(mul(mul(ones)))
    val h2 = mul(a2)
    val got2 = Cluster.hits(edges.toDF("a", "b"), iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    adj.keys.foreach { n =>
      assert(got2(n) == ((a2(n), h2(n))), s"node $n") }
  }
}
