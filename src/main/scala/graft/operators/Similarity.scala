package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the scale of the query side:
  *  - `bruteForceTopK`: exact top-k via a broadcast nested-loop join —
  *    correct baseline; right choice when |queries| is broadcast-sized
  *    (the corpus side streams, never materializes the cross product).
  *  - `lshTopK`: random-hyperplane LSH bucketing (banded, OR-amplified)
  *    prunes the candidate set before exact cosine re-ranking — the 100 TB
  *    path: one shuffle on (band, key), candidate lists bounded by bucket
  *    size instead of |corpus|.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `queries` must be small
    * enough to broadcast. Output: (query_id, vec_id, score, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "q_embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
      .filter(col(corpusId) =!= col(queryId))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("score"), col("rank"))
  }

  /** LSH-bucketed approximate top-k. Both sides are bucketed by banded
    * hyperplane signatures; candidates = pairs sharing >= 1 band key; exact
    * cosine re-rank inside candidates. Recall < 1 by design; raise `bands`
    * for higher recall at higher cost. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 16, bands: Int = 4,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "q_embedding"): DataFrame = {
    val dim = 64
    val planes = VectorFns.randomPlanes(nPlanes, dim)
    val bitsPerBand = nPlanes / bands
    def withBuckets(df: DataFrame, vec: String) =
      df.withColumn("__sig", VectorFns.hyperplaneSig(col(vec), planes))
        .withColumn("__b", explode(VectorFns.sigBands(col("__sig"), bands, bitsPerBand)))
        .withColumn("__band", col("__b.band")).withColumn("__key", col("__b.key"))
        .drop("__b", "__sig")
    val cb = withBuckets(corpus, corpusVec)
    val qb = withBuckets(queries, queryVec)
    val candidates = cb.join(qb, Seq("__band", "__key"))
      .filter(col(corpusId) =!= col(queryId))
      .select(col(queryId), col(corpusId), col(corpusVec), col(queryVec))
      .dropDuplicates(queryId, corpusId)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId))
    candidates
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("score"), col("rank"))
  }
}
