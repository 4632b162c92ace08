package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FixedLog

/** Privacy-risk auditing for training corpora — k-anonymity (Sweeney,
  * "k-Anonymity: A Model for Protecting Privacy", IJUFKS 2002) and
  * l-diversity (Machanavajjhala et al., ICDE 2006) over declared
  * quasi-identifier columns: a release is k-anonymous when every
  * quasi-identifier combination matches at least k rows, and l-diverse
  * when each such group carries at least l distinct sensitive values.
  * This is the governance gate a dataset passes BEFORE leaving a
  * curation pipeline — the relational counterpart of [[graft.functions
  * .TextFns]]' PII scrubbing (which handles free text).
  *
  * Scale shape: one hash-partial groupBy over the quasi-identifier tuple
  * (map-side combine carries one row per observed combination per
  * partition); the distinct-sensitive count is the standard two-phase
  * expand — no windows, no joins, no driver state. Suppression is one
  * broadcast-free semi join of the data against its own failing groups —
  * two scans total, or one when the audit frame is reused. */
object Privacy {

  /** Per-group audit: the quasi-identifier columns, `group_size`,
    * `l_diversity` (distinct sensitive values), and `k_anonymous`.
    * NULL quasi-identifier values form groups like any other value
    * (they match each other on re-identification too). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: no quasi-identifiers")
    require(k >= 1, s"kAnonymityAudit: k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("k_anonymous", col("group_size") >= k)
  }

  /** Enforcement: drop every row whose quasi-identifier group is smaller
    * than `k` (suppression — the conservative baseline; generalization
    * belongs to the caller's QI construction, e.g. truncating a phone to
    * its prefix before auditing). */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
                          k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "suppressSmallGroups: bad args")
    val keep = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") >= k)
      .select(quasiCols.map(c => col(c).as(s"__k_$c")): _*)
    // null-safe equality: NULL quasi-identifier values group together in
    // the audit (groupBy treats NULL as a value) — the semi join must
    // match them the same way or every NULL-QI row is silently suppressed
    val cond = quasiCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(keep, cond, "left_semi")
  }

  /** ε-differentially-private count release via the Laplace mechanism
    * (Dwork et al., "Calibrating Noise to Sensitivity", TCC 2006):
    * per-group counts plus `Laplace(Δ/ε)` noise, Δ = 1 for counting
    * queries. The noise is DETERMINISTIC — inverse-CDF transform
    * `-b·sign(u-½)·ln(1-2|u-½|)` of a hash-derived uniform
    * ([[Sampling.bucket]] of the group key + ½ over the granularity) —
    * the [[Dsir.resample]] Gumbel discipline: identical on retry, at any
    * partitioning, and across engines. (A production release would take
    * a fresh secret seed per release; the mechanism, sensitivity
    * calibration, and plan shape are exactly this.) The `ln` goes through
    * [[graft.functions.FixedLog]]: with granularity G = 2^g,
    * `1 - 2|u-½| = m/G` where `m = G - |2h+1-G|` is an odd INTEGER, so
    * `ln(m/G) = fixedLn(m) - g·LN2` and the whole noise value is integer
    * arithmetic (1/ε applied as an exact rational) quantized to
    * DECIMAL(18,6) by integer rounding — engine-exact by construction,
    * no libm (the round-10–11 DSIR lesson).
    *
    * Scale shape: one hash-partial groupBy; the noise is a narrow
    * per-group projection. Returns `(groupCol, epsilon, noisy_count)` —
    * the true count never leaves the operator. */
  def dpLaplaceCounts(df: DataFrame, groupCol: String, epsilon: Double,
                      seed: String = "dp-lap"): DataFrame = {
    require(epsilon > 0, s"dpLaplaceCounts: epsilon must be > 0, got $epsilon")
    val (sE, aE) = FixedLog.decimalAsRational(epsilon) // ε = aE/sE, 1/ε = sE/aE
    val g = Sampling.Granularity
    val kG = java.lang.Long.numberOfTrailingZeros(g)
    val base = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__d",
        Sampling.bucket(col(groupCol), seed) * lit(2L) + lit(1L) - lit(g))
      .withColumn("__m", lit(g) - abs(col("__d"))) // odd, in [1, G-1]
    val noise = FixedLog.withLn(base, "__m", "__lnm")
      .withColumn("__mag12", expr(
        s"(CAST(${kG}L * ${FixedLog.Ln2S12}L - __lnm AS DECIMAL(38,0)) " +
          s"* ${sE}L) div ${aE}L"))
      .withColumn("__noise12",
        when(col("__d") < 0, -col("__mag12")).otherwise(col("__mag12")))
    FixedLog.withS12ToDec6(noise, "__noise12", "__noiseq")
      .select(col(groupCol), lit(epsilon).as("epsilon"),
        (col("__n") + col("__noiseq")).cast("decimal(18,6)").cast("double")
          .as("noisy_count"))
  }

  /** Keyed pseudonymization of an identifier column (the GDPR Art. 4(5)
    * mechanism): replace the id with SHA-256 of a secret-seed-prefixed
    * rendering, so joins and group-bys still work on the token while
    * re-identification requires the seed. Deterministic (same id → same
    * token, across retries/partitions/engines), injective in practice
    * (collisions are 2⁻¹²⁸-grade; the spec pins bijectivity on the
    * fixture), seed-sensitive (a new seed is a new token universe —
    * unlinkability across releases). A production deployment holds the
    * seed in a KMS, not a literal; the mechanism, determinism contract,
    * and plan shape are exactly this.
    *
    * Scale shape: a narrow per-row projection — no shuffle, no state;
    * codegen'd sha2 over a concat. NULL ids stay NULL (never a shared
    * "hash of empty" bucket that would silently merge all unknowns). */
  def pseudonymize(df: DataFrame, idCol: String, seed: String,
                   tokenCol: String = "token"): DataFrame = {
    require(seed.nonEmpty, "pseudonymize: empty seed")
    df.withColumn(tokenCol,
      when(col(idCol).isNotNull,
        sha2(concat(lit(seed), lit("|"), col(idCol).cast("string")), 256)))
      .drop(idCol)
  }
}
