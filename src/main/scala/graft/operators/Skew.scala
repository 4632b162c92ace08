package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the failure mode AQE's skew-join handling
  * (enabled in [[graft.Session]]) doesn't fully cover: a single key so hot
  * that one reducer owns most of a shuffle.
  *
  * Both operators salt deterministically (hash of stable columns, not
  * `rand()`) so results are reproducible across retries and cluster sizes —
  * a task retry with a nondeterministic salt would double-count rows.
  */
object Skew {

  /** Salted inner equi-join: the left (large, skewed) side fans each row
    * into one of `n` salt lanes keyed by a hash of `leftSaltSource`; the
    * right side is replicated into all `n` lanes. Each hot key's rows thus
    * spread over `n` reducers instead of one. Use when right is too big to
    * broadcast but small enough to replicate n-fold. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, n: Int,
                 leftSaltSource: Column): DataFrame = {
    require(n > 1, "salt factor must be > 1")
    val l = left.withColumn("__salt", pmod(hash(leftSaltSource), lit(n)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation: partial agg on (key, salt) spreads a hot
    * key over `n` reducers, final agg on key merges the partials. Each agg
    * is (outputName, sourceColumn, partialAgg, finalMerge) — e.g.
    * ("total", col("x"), sum, sum) or ("n", lit(1), count, sum); the final
    * merge runs over the partial column named `outputName`. */
  def saltedAgg(df: DataFrame, key: Seq[String], n: Int, saltSource: Column,
                aggs: Seq[(String, Column, Column => Column, Column => Column)]): DataFrame = {
    require(n > 1, "salt factor must be > 1")
    val partials = aggs.map { case (name, src, p, _) => p(src).as(name) }
    val finals = aggs.map { case (name, _, _, f) => f(col(name)).as(name) }
    df.withColumn("__salt", pmod(hash(saltSource), lit(n)))
      .groupBy((key :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(key.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
