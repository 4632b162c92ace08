package graft

import graft.operators.VectorAgg

/** Vector centroids: exact means, dim order, NULL-vector exclusion,
  * partition-count invariance (the decimal-carrier determinism contract). */
class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Seq(
    (1, Array(1.0f, 2.0f, 3.0f)),
    (1, Array(3.0f, 4.0f, 5.0f)),
    (2, Array(10.0f, 0.0f, -2.0f)),
    (2, null.asInstanceOf[Array[Float]])
  ).toDF("label", "embedding")

  test("centroid is the per-dim mean in dim order; null vectors excluded") {
    val got = VectorAgg.centroids(embs).collect()
      .map(r => r.getInt(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(got(1)._1 == Seq(2.0, 3.0, 4.0) && got(1)._2 == 2L)
    assert(got(2)._1 == Seq(10.0, 0.0, -2.0) && got(2)._2 == 1L)
  }

  test("result is identical across partition counts (decimal carrier)") {
    val p1 = VectorAgg.centroids(embs.repartition(1)).orderBy("label").collect()
    val p7 = VectorAgg.centroids(embs.repartition(7)).orderBy("label").collect()
    assert(p1.sameElements(p7))
  }
}
