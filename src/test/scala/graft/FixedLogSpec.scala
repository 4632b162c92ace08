package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedLog

/** [[graft.functions.FixedLog]] — the cross-engine fixed-point ln. The
  * Spark column pipeline must reproduce, bit for bit, the reference
  * integer algorithm (restated here in BigInt — floor-divides on
  * non-negative operands, the same steps the DuckDB items encode), and the
  * result must sit within 1e-9 of true ln. The DuckDB side is exercised by
  * the `corpus_dsir_*` oracle gates. */
class FixedLogSpec extends SparkSpec {
  import spark.implicits._

  /** Reference restatement: the exact integer algorithm, independent of
    * any SQL engine. */
  private def refLn(n: Long): Long = {
    require(n >= 1)
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val t = 1L << k
    val scale = BigInt(FixedLog.Scale)
    val z = BigInt(n - t) * scale / BigInt(n + t) // floor: operands >= 0
    val z2 = z * z / scale
    var prev = z
    var series = z
    for (j <- Seq(3, 5, 7, 9, 11, 13, 15, 17)) {
      prev = prev * z2 / scale
      series += prev / j
    }
    k * FixedLog.Ln2S12 + 2 * series.toLong
  }

  private val probes: Seq[Long] = Seq(1L, 2L, 3L, 7L, 8L, 9L, 255L, 256L,
    257L, 16383L, 16384L, 16385L, 999983L, (1L << 40) - 1, 1L << 40,
    (1L << 40) + 12345L, 123456789012345L) ++ (1L to 200L)

  test("Spark pipeline == BigInt reference, exactly, over edge probes " +
    "and 1..200 (powers of two, off-by-ones, large values)") {
    val df = probes.toDF("n")
    val got = FixedLog.withLn(df, "n", "lnn")
      .select($"n", $"lnn").as[(Long, Long)].collect().toMap
    for (n <- probes)
      assert(got(n) == refLn(n), s"n=$n: spark=${got(n)} ref=${refLn(n)}")
  }

  test("fixed-point ln is within 1e-9 of true ln (2x series tail < 1.1e-10 " +
    "at z<1/3, truncation drift < 4e-11, ln2-literal drift < 4e-12/bit)") {
    for (n <- probes if n >= 1) {
      val err = math.abs(refLn(n) / 1e12 - math.log(n.toDouble))
      assert(err < 1e-9, s"n=$n err=$err")
    }
  }

  /** Reference restatement of [[FixedLog.withExpNeg]] in BigInt. */
  private def refExpNeg(m: Long): Long = {
    require(m >= 0)
    if (m >= FixedLog.Ln1e12S12) 0L
    else {
      val k = (m / FixedLog.Ln2S12).toInt
      val r = BigInt(m - k * FixedLog.Ln2S12)
      val scale = BigInt(FixedLog.Scale)
      var prev = r
      var e = scale + r
      for (j <- 2 to 15) { prev = prev * r / scale / j; e += prev }
      ((scale * scale) / (e * BigInt(1L << k))).toLong
    }
  }

  test("withExpNeg == BigInt reference exactly, and within 1e-9 of true " +
    "e^-x, including the >= ln(1e12) zero short-circuit") {
    val s = FixedLog.Scale
    val expProbes = Seq(0L, 1L, 500000L, s / 2, s - 1, s, 2 * s + 12345L,
      7 * s, 13 * s + 999999999999L, 27 * s,
      FixedLog.Ln1e12S12 - 1, FixedLog.Ln1e12S12, FixedLog.Ln1e12S12 + 5)
    val df = expProbes.toDF("m")
    val got = FixedLog.withExpNeg(df, "m", "w")
      .select($"m", $"w").as[(Long, Long)].collect().toMap
    for (m <- expProbes) {
      assert(got(m) == refExpNeg(m), s"m=$m: spark=${got(m)} ref=${refExpNeg(m)}")
      val err = math.abs(refExpNeg(m) / 1e12 - math.exp(-m / 1e12))
      assert(err < 1e-9, s"m=$m err=$err")
    }
  }

  test("scale-12 -> DECIMAL(18,6) quantizer rounds half away from zero " +
    "by integer arithmetic, both signs, ties included") {
    val cases = Seq(
      0L -> "0.000000",
      1234561500000L -> "1.234562",      // exact .5 tie, up
      1234560499999L -> "1.234560",      // just under the tie
      -1234561500000L -> "-1.234562",    // exact .5 tie, away from zero
      -1234560499999L -> "-1.234560",
      999999999999L -> "1.000000",
      -500000L -> "-0.000001")
    val df = cases.map(_._1).toDF("v")
    val got = FixedLog.withS12ToDec6(df, "v", "q")
      .select($"v", $"q".cast("string")).as[(Long, String)].collect().toMap
    for ((v, want) <- cases)
      assert(got(v) == want, s"v=$v: got=${got(v)} want=$want")
  }
}
