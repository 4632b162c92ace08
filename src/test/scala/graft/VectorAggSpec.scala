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

  test("int8 quantization: extremes hit ±127, zero vector yields NULL qvec") {
    val vs = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val got = VectorAgg.quantizeInt8(vs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L)) // null vector excluded
    val r1 = got(1L)
    assert(r1.getDouble(1) == 2.0)
    assert(r1.getSeq[Int](2) == Seq(127, -63, 32)) // floor(-63.5+0.5)=-63, floor(31.75+0.5)=32
    assert(r1.getDouble(3) <= 2.0 / 127 / 2 + 1e-12) // err bounded by half a step
    assert(got(2L).isNullAt(2) && got(2L).isNullAt(3))
  }
}
