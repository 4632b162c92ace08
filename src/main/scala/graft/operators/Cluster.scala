package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph clustering for dedup pipelines: connected components over
  * near-duplicate pairs, assigning every document the minimum document id
  * reachable through the pair graph (the cluster's canonical
  * representative). This is the step that turns pairwise near-dup output
  * ([[Dedup.minhashNearDups]] et al.) into keep/drop decisions: keep each
  * cluster's representative, drop the rest — without it, transitive
  * near-dup chains (A~B, B~C but not A~C) survive pairwise filtering.
  *
  * Algorithm: iterative min-label propagation (the MapReduce-era HCC shape —
  * Kang/Tsourakakis/Faloutsos "PEGASUS", ICDM 2009; Kiveris et al.
  * "Connected Components in MapReduce and Beyond", SoCC 2014 describe the
  * large-star/small-star contraction this should be swapped for when
  * component diameters are unbounded). Each round is one shuffle join
  * (propagate labels across edges) plus one shuffle aggregate (min label
  * per node); rounds to converge = graph diameter. Near-dup graphs are
  * dense small clusters — single-digit diameter — so a handful of rounds
  * suffices; `maxIters` fail-fasts the pathological chain case instead of
  * looping forever.
  *
  * Scale notes: labels are `localCheckpoint`ed every round, for two
  * measured reasons (see repo plan-pitfall notes): iterative
  * self-referential plans grow analyzer lineage super-linearly, and the
  * analyzer's self-join deduplication re-aliases a frame referenced twice
  * in one query (labels feeds both the union and the propagate join) so it
  * can MISS its own cache entry. Checkpointing materializes each round once
  * and hands later rounds a flat scan node. On a multi-executor cluster
  * with preemptible executors, prefer `setCheckpointDir` + `.checkpoint()`
  * (reliable storage) over executor-local blocks.
  */
object Cluster {

  /** Connected components of the undirected pair graph `(aCol, bCol)`.
    * Returns one row per node that appears in at least one pair:
    * `(idOut, repOut)` with `repOut` = min node id in the component.
    * Singleton documents (no pairs) are absent by construction — callers
    * wanting keep/drop over the full corpus left-join this result and
    * coalesce the representative to the document's own id. Deterministic:
    * min-label is independent of propagation order. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a",
                          bCol: String = "b", idOut: String = "doc_id",
                          repOut: String = "cluster_rep",
                          maxIters: Int = 25): DataFrame = {
    // both edge directions via one explode, NOT a self-union: a union of
    // two selects over `pairs` is two separate subtrees, so the (often
    // expensive — MinHash banding) pair-producing pipeline would execute
    // twice before the persist ever kicks in
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed labels with min(own id, min neighbor id): the same single
    // shuffle a distinct-nodes init would cost, but it bakes in the first
    // propagation round — for the common near-dup shape (star/pair
    // clusters whose min id is adjacent to every member) this converges at
    // init and the loop body runs once, purely as the convergence proof
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint(true)
    // convergence probe: labels only ever decrease and the node set is
    // fixed (every dst is also a src by symmetry), so the exact label sum
    // is strictly decreasing until the fixpoint — an unchanged sum IS
    // convergence. One narrow scan of the checkpointed labels per round,
    // where a changed-rows join would re-shuffle both label sets.
    // The sum probe is only sound for integral ids: casting a string/UUID
    // label to decimal yields NULL for every row, so prev==next==NULL from
    // round 1 and the loop would declare convergence after one iteration,
    // silently returning wrong components. Non-integral ids fall back to
    // the join-based changed-rows count (correct for any orderable type).
    val integralIds = labels.schema("label").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // NULL sum over a NON-EMPTY label set means overflow (non-ANSI NULL),
    // not a fixpoint — report "changed" so the loop keeps going to maxIters
    // instead of silently converging on garbage.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(sum(col("label").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n")).head
      val s = row.getDecimal(0)
      if (s == null) {
        require(row.getLong(1) == 0L,
          "connectedComponents: label sum overflowed decimal(38,0); " +
            "convergence probe unusable for this id range")
        java.math.BigDecimal.ZERO // empty label set
      } else s
    }
    var prevSum = if (integralIds) labelSum(labels) else null
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val propagated = edges
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.unionByName(propagated)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      if (integralIds) {
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
      } else {
        val changed = next.as("n")
          .join(labels.as("p"), col("n.id") === col("p.id"))
          .filter(col("n.label") =!= col("p.label"))
          .limit(1).count() // limit(1): existence probe, not a full count
        converged = changed == 0L
      }
      labels = next
      iters += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents: no fixpoint after $maxIters rounds (component " +
        "diameter exceeds the bound; raise maxIters or switch to star contraction)")
    labels.select(col("id").as(idOut), col("label").as(repOut))
  }
}
