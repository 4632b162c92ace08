package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector math over `array<float>` columns via codegen-friendly
  * higher-order functions — no UDFs, no vector-library dependency. All
  * arithmetic is promoted to double (deterministic, and avoids float
  * summation-order drift across partitions). */
object VectorFns {

  /** Elementwise dot product (native expression — single JVM loop/row). */
  def dot(a: Column, b: Column): Column = VectorExprs.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosineSim(a, b)

  /** Squared L2 distance. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast(DoubleType) - y.cast(DoubleType)) *
                  (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic pseudo-random hyperplanes (seeded) for cosine LSH. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection bit signature for cosine LSH: bit i = 1 iff
    * dot(v, plane_i) >= 0. Returns a Long (supports up to 64 planes). */
  def hyperplaneSig(v: Column, planes: Seq[Seq[Double]]): Column =
    VectorExprs.hyperplaneSig(v, planes)

  /** Split a Long signature into `bands` keys of `bitsPerBand` bits each,
    * tagged with the band index (for OR-amplified LSH bucketing). */
  def sigBands(sig: Column, bands: Int, bitsPerBand: Int): Column = {
    val mask = (1L << bitsPerBand) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * bitsPerBand).bitwiseAND(lit(mask)).as("key"))
    }: _*)
  }
}
