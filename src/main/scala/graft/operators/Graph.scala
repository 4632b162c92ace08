package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the clustering-coefficient /
  * community-density primitive over similarity graphs (e.g. the near-dup
  * pair graph, where triangle density distinguishes boilerplate families
  * from chance collisions).
  *
  * Algorithm: orient every undirected edge low→high endpoint, then count
  * wedges u→v→w that close with an oriented edge u→w. Each triangle
  * {u<v<w} is counted EXACTLY once (only from its smallest vertex), so no
  * division by 3/6 and no double joins. Two shuffle joins total; the wedge
  * join's fan-out is bounded by per-vertex out-degree, which id-orientation
  * caps at the vertex's degree (the classic refinement — orienting by
  * DEGREE then id caps it at O(sqrt(|E|)) per vertex [Suri & Vassilvitskii,
  * WWW 2011] — drops in here by swapping the orientation key; at the gated
  * graph sizes id-orientation already yields the same plan shape).
  */
object Graph {

  /** Count triangles in an undirected edge list (columns `src`, `dst`).
    * Self-loops are dropped; duplicate/reversed edges are canonicalized
    * away. Returns one row: (n_edges, n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame = {
    val oriented = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("u"), col("e1.v").as("v"),
        col("e2.v").as("w"))
    val closed = wedges.join(
      oriented.select(col("u"), col("v").as("w")), Seq("u", "w"))
    oriented.agg(count(lit(1)).as("n_edges"))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }
}
