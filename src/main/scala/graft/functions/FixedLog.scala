package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine FIXED-POINT natural log — `ln(n)` for integer `n >= 1`,
  * returned as a scale-12 fixed-point BIGINT (`round-ish(ln(n) * 10^12)`),
  * computed by IDENTICAL exact integer arithmetic on Spark and DuckDB.
  *
  * Why this exists: libm `ln` is not correctly rounded, so
  * `CAST(ln(x) AS DECIMAL(18,6))` can quantize DIFFERENTLY on two engines
  * (or two glibc builds) when `ln(x)` lands within an ulp of a 0.5e-6
  * boundary — the exact failure mode that made the DSIR gates
  * (`corpus_dsir_select`/`corpus_dsir_resample`) pass the local harness
  * but fail the driver's twice (rounds 10–11). This helper removes libm
  * from the value path entirely: every step below is integer add /
  * multiply / floor-divide on non-negative operands, which both engines
  * (and any IEEE-less engine) evaluate to the SAME integer, so equality is
  * by construction, not by margin.
  *
  * Algorithm (all in scale-12 fixed point, operands kept non-negative so
  * Spark's truncating `div` == DuckDB's flooring `//`):
  *   1. k = floor(log2 n) = length(bin(n)) - 1; t = 2^k via shiftleft
  *      (both engines print minimal binary strings; both shift exactly);
  *   2. m = n / 2^k in [1, 2); z = (m-1)/(m+1) = (n-t)/(n+t) in [0, 1/3),
  *      fixed as z12 = floor((n-t) * 10^12 / (n+t)) — the division is the
  *      ONLY inexact step and both engines floor the same exact rational
  *      (numerator widened to DECIMAL(38,0) / HUGEINT, never overflows for
  *      n < 10^26);
  *   3. ln(m) = 2*atanh(z) = 2*(z + z^3/3 + ... + z^15/15): powers built
  *      by repeated multiply-then-floor at scale 12 through z^17; after
  *      the factor 2, series tail (z < 1/3) < 1.1e-10, truncation drift
  *      < 4e-11;
  *   4. ln(n) = k*LN2 + 2*atanh(z) with LN2 the shared scale-12 literal.
  *
  * Total deviation from true ln(n) is < 1e-9 — far inside the 1e-6
  * quantization the gates publish — and, decisively, the SAME deviation on
  * every engine. Inputs must be BIGINT-typed columns >= 1 (n = 1 yields 0
  * via z = 0). The fixed-point result fits a BIGINT for any n < 2^63.
  */
object FixedLog {

  /** Fixed-point scale: 10^12. */
  val Scale = 1000000000000L

  /** round(ln(2) * 10^12) — shared literal, both engines. */
  val Ln2S12 = 693147180560L

  /** round(ln(10^12) * 10^12) — for ln of a scale-12 fixed-point value:
    * ln(v) = fixedLn(v12) - Ln1e12S12. */
  val Ln1e12S12 = 27631021115929L

  private val Powers = Seq(3, 5, 7, 9, 11, 13, 15, 17)

  /** Append column `out` (BIGINT, scale-12 fixed point) = ln(`in`), where
    * `in` names an existing BIGINT column with values >= 1. Temp columns
    * are `<out>_*` and dropped. `in`/`out` must be plain identifiers (they
    * are spliced into SQL text). */
  def withLn(df: DataFrame, in: String, out: String): DataFrame = {
    var d = df
      .withColumn(s"${out}_k", (length(bin(col(in))) - lit(1)).cast("int"))
      .withColumn(s"${out}_t", expr(s"shiftleft(CAST(1 AS BIGINT), ${out}_k)"))
      .withColumn(s"${out}_z", expr(
        s"CAST((CAST($in - ${out}_t AS DECIMAL(38,0)) * $Scale) div " +
          s"CAST($in + ${out}_t AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn(s"${out}_z2", expr(
        s"CAST((CAST(${out}_z AS DECIMAL(38,0)) * ${out}_z) div $Scale AS BIGINT)"))
    var prev = s"${out}_z"
    for (j <- Powers) {
      d = d.withColumn(s"${out}_z$j", expr(
        s"CAST((CAST($prev AS DECIMAL(38,0)) * ${out}_z2) div $Scale AS BIGINT)"))
      prev = s"${out}_z$j"
    }
    val series =
      (s"${out}_z" +: Powers.map(j => s"${out}_z$j div $j")).mkString(" + ")
    d.withColumn(out, expr(s"${out}_k * ${Ln2S12}L + 2L * ($series)"))
      .drop(Seq("k", "t", "z", "z2").map(s => s"${out}_$s") ++
        Powers.map(j => s"${out}_z$j"): _*)
  }

  /** DuckDB restatement of [[withLn]]: SELECT-list items (lateral column
    * aliases — DuckDB resolves same-SELECT references left-to-right) that
    * end with `... AS <out>`. `inner` is any BIGINT-valued expression. */
  def duckLnItems(inner: String, out: String): Seq[String] = {
    val head = Seq(
      s"CAST($inner AS BIGINT) AS ${out}_n",
      s"CAST(length(bin(${out}_n)) - 1 AS INTEGER) AS ${out}_k",
      s"(CAST(1 AS BIGINT) << ${out}_k) AS ${out}_t",
      s"CAST((CAST(${out}_n - ${out}_t AS HUGEINT) * $Scale) // " +
        s"CAST(${out}_n + ${out}_t AS HUGEINT) AS BIGINT) AS ${out}_z",
      s"CAST((CAST(${out}_z AS HUGEINT) * ${out}_z) // $Scale AS BIGINT) " +
        s"AS ${out}_z2")
    val pows = Powers.zip(s"${out}_z" +: Powers.dropRight(1).map(j =>
      s"${out}_z$j")).map { case (j, prev) =>
      s"CAST((CAST($prev AS HUGEINT) * ${out}_z2) // $Scale AS BIGINT) " +
        s"AS ${out}_z$j"
    }
    val series =
      (s"${out}_z" +: Powers.map(j => s"${out}_z$j // $j")).mkString(" + ")
    head ++ pows :+ s"(${out}_k * $Ln2S12 + 2 * ($series)) AS $out"
  }

  /** Append column `out` = `in` (a scale-12 fixed-point BIGINT, either
    * sign) quantized to an EXACT DECIMAL(18,6), rounding half away from
    * zero by integer arithmetic — no double, no engine-owned decimal
    * rescale, so both engines produce the identical decimal. */
  def withS12ToDec6(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out, expr(
      s"CAST(CAST(CASE WHEN $in < 0L THEN -((-$in + 500000L) div 1000000L) " +
        s"ELSE ($in + 500000L) div 1000000L END AS DECIMAL(18,0)) " +
        s"* CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6))"))

  /** DuckDB restatement of [[withS12ToDec6]] as one expression. */
  def duckS12ToDec6(in: String): String =
    s"CAST(CAST(CASE WHEN $in < 0 THEN -((-$in + 500000) // 1000000) " +
      s"ELSE ($in + 500000) // 1000000 END AS DECIMAL(18,0)) " +
      s"* CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6))"
}
