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

  test("kmeansStep: Lloyd objective is non-increasing and cells keep counts") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 60).map { i =>
      val center = Array.fill(4)(if (i % 3 == 0) 5f else if (i % 3 == 1) -5f else 0f)
      (i.toLong, center.map(_ + rnd.nextGaussian().toFloat))
    }
    val embs = data.toDF("vec_id", "embedding")
    val cents0 = embs.filter($"vec_id" < 3)
      .select($"vec_id".as("centroid_id"), $"embedding".as("c_vec"))
    def sse(cs: Array[(Long, Array[Double])]): Double =
      data.map { case (_, v) =>
        cs.map { case (_, c) =>
          v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        }.min
      }.sum
    val c0 = cents0.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val stepped = graft.operators.VectorAgg.kmeansStep(embs, cents0)
    val c1 = stepped.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    assert(sse(c1) <= sse(c0) + 1e-9, s"Lloyd step increased SSE: ${sse(c0)} -> ${sse(c1)}")
    assert(stepped.collect().map(_.getLong(2)).sum == 60L) // every vector assigned
  }

  test("kmeansLloyd: converges to a fixpoint on separable data and SSE beats one step") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 90).map { i =>
      val center = Array.fill(4)(if (i % 3 == 0) 8f else if (i % 3 == 1) -8f else 0f)
      (i.toLong, center.map(_ + rnd.nextGaussian().toFloat))
    }
    val embs = data.toDF("vec_id", "embedding")
    val cents0 = embs.filter($"vec_id" < 3)
      .select($"vec_id".as("centroid_id"), $"embedding".as("c_vec"))
    def sse(cs: Array[(Long, Array[Double])]): Double =
      data.map { case (_, v) =>
        cs.map { case (_, c) =>
          v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        }.min
      }.sum
    def cents(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val one = cents(VectorAgg.kmeansStep(embs, cents0))
    val looped = VectorAgg.kmeansLloyd(embs, cents0, maxIters = 10)
    val multi = cents(looped)
    assert(sse(multi) <= sse(one) + 1e-9,
      s"looped Lloyd worse than one step: ${sse(one)} -> ${sse(multi)}")
    assert(looped.collect().map(_.getLong(2)).sum == 90L) // all vectors assigned
    // fixpoint: one more step from the converged codebook changes nothing
    val again = cents(VectorAgg.kmeansStep(embs,
      looped.select($"centroid_id", $"centroid".as("c_vec"))))
    assert(again.sortBy(_._1).map(_._2.toSeq).toSeq ==
      multi.sortBy(_._1).map(_._2.toSeq).toSeq)
  }

  test("kmeansLloyd: maxIters=1 equals a single kmeansStep") {
    val embs = (0 until 20).map(i => (i.toLong, Array(i.toFloat, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val cents0 = embs.filter($"vec_id" < 2)
      .select($"vec_id".as("centroid_id"), $"embedding".as("c_vec"))
    val a = VectorAgg.kmeansStep(embs, cents0).orderBy("centroid_id").collect()
    val b = VectorAgg.kmeansLloyd(embs, cents0, maxIters = 1)
      .orderBy("centroid_id").collect()
    assert(a.sameElements(b))
  }

  test("pcaPowerTop recovers a planted dominant direction and returns a " +
    "unit vector") {
    // deterministic synthetic: dim 0 carries variance ~4, every other dim
    // tiny structured noise — the top principal direction is e0
    val vs = (0 until 120).map { i =>
      val v = Array.tabulate(8) { d =>
        if (d == 0) ((i % 7) - 3).toFloat
        else (((i * (d + 3)) % 5) - 2) * 0.01f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val loadings = VectorAgg.pcaPowerTop(vs, iters = 4, dim = 8)
      .orderBy("dim").collect().map(_.getDouble(1))
    assert(loadings.length == 8)
    // the norm-sum runs through the DECIMAL(18,6) carrier (truncation
    // ~5e-7 per squared term), so unit norm holds to ~dims×1e-6, not ulps
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"not unit norm: $norm")
    assert(math.abs(loadings(0)) > 0.99,
      s"dominant direction not recovered: ${loadings.toSeq}")
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
