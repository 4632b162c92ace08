package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Distributed vector aggregation: per-group centroids over an embedding
  * column — the k-means UPDATE step (mean of assigned vectors), the
  * complement of [[Similarity]]'s IVF ASSIGNMENT step; also the
  * class-prototype / mean-pooling primitive.
  *
  * Scale shape: `posexplode` fans each vector into (group, dim, value)
  * rows — dim count is a constant (64 here), so the expansion is a fixed
  * small factor, and the per-(group, dim) aggregation map-side combines
  * down to |groups| × dims rows before the one shuffle. The re-assembly
  * into an ordered array is a second tiny aggregation over those rows.
  * Never collect vectors to the driver; never `reduce` arrays row-by-row
  * (no partial aggregation, one long dependency chain).
  *
  * Determinism: per-dimension sums run in the DECIMAL(18,6) carrier
  * (exact, merge-order independent) and emit DOUBLE — same contract as
  * every aggregate in this engine, and what makes the result identical
  * across partition counts AND to the DuckDB oracle. */
object VectorAgg {

  /** Per-`labelCol` centroid: `(label, centroid: Array[Double], n_vecs)`.
    * Rows with NULL vectors are excluded (they would shift `n_vecs` but
    * contribute no dims). */
  def centroids(embs: DataFrame, labelCol: String = "label",
                vecCol: String = "embedding"): DataFrame = {
    val dimvals = embs
      .filter(col(vecCol).isNotNull)
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
    val perDim = dimvals
      .groupBy(col(labelCol), col("dim"))
      .agg(Fns.sumExact(col("x").cast("double")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s") / col("n"))
    perDim
      .groupBy(col(labelCol))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("centroid"),
        max(col("n")).as("n_vecs"))
  }
}
