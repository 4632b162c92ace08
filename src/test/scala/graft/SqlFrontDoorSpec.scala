package graft

import graft.sources.Tables

/** SQL front door: the reference's users speak SQL (its mart is consumed
  * through a SQL view layer — /root/reference/sql/schema_star.sql), so the
  * engine must accept `spark.sql(...)` as a first-class entry point, not
  * only the DataFrame API. The flagship already proves this
  * (FlagshipSpec × TaxaVariacao.sparkSql); this spec widens the proof to
  * every gated query whose oracle SQL is dialect-shared ANSI: the SAME
  * string the DuckDB oracle runs must, executed by `spark.sql` over temp
  * views of the fixture tables, reproduce the DataFrame plan's rows
  * exactly — order, schema column names, and values.
  *
  * Queries whose oracles lean on DuckDB-only surface (strftime, list_*,
  * epoch_us, quoted identifiers, unnest) are exercised through the driver's
  * DuckDB gate instead; this list is every dialect-shared entry.
  */
class SqlFrontDoorSpec extends SparkSpec {

  /** Oracle SQL that is valid in BOTH DuckDB and Spark SQL. */
  private val sharedDialect = Seq(
    "q1_agg", "q2_min_cost_supp", "q3_top_orders", "q4_order_priority",
    "q5_region_supplier", "q13_cust_dist", "q14_promo", "q16_supplier_parts",
    "q17_small_qty", "q18_large_orders", "q19_disjunctive_rev",
    "q22_idle_custs", "j1_star_join", "j_semi", "j_anti", "j_full_outer",
    "j_stream_interval", "j_skewed_salted", "a_skewed_salted", "a_rollup",
    "a_cube", "u1_union", "u2_intersect", "u3_except", "o1_topk",
    // the SQL side restates the CLOSED FORM (min per planted segment)
    // while the DataFrame side runs the star-contraction CC — equality is
    // an algorithm-vs-specification check, not a parse check
    "dedup_cluster_chain",
    // DataFrame side reads the bucketed tables; SQL side the raw views
    "j_bucketed",
    "funnel_steps", "cdc_merge", "a_mode",
    "a_weighted_avg", "u4_except_all", "w_share_of_total",
    "a_histogram_eqdepth",
    "q6_forecast_revenue", "q7_nation_volume", "q10_returned_items",
    "q15_top_supplier", "audit_orphans", "stream_matview",
    "q8_market_share", "q9_product_profit", "q11_important_stock",
    "q20_heavy_suppliers", "u5_intersect_all",
    // bloom path == the plain-join SQL: the prefilter's losslessness
    // proven through the front door too
    "j_bloom_prefilter",
    // algorithm-vs-specification checks (like dedup_cluster_chain): the
    // DataFrame side runs the operator, the SQL side the closed-form spec
    // (w_value_family stays DuckDB-only: its oracle extends a named
    // window with an explicit frame — `OVER (w ROWS BETWEEN ...)` — which
    // Spark's parser does not accept)
    "graph_triangles", "s_dynamic_overwrite", "a_hll_partials",
    "w_ewma")

  private lazy val viewsReady: Unit =
    Tables.names.foreach { n =>
      Tables.table(spark, sf0001, n).createOrReplaceTempView(n)
    }

  sharedDialect.foreach { name =>
    test(s"spark.sql front door == DataFrame plan: $name") {
      viewsReady
      val df = SparkEntry.queries(name)(spark, sf0001)
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      assert(viaSql.columns.toSeq == df.columns.toSeq,
        s"column mismatch: sql=${viaSql.columns.toSeq} df=${df.columns.toSeq}")
      val a = viaSql.collect()
      val b = df.collect()
      assert(a.length == b.length, s"row count: sql=${a.length} df=${b.length}")
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x.toSeq == y.toSeq, s"row $i: sql=$x df=$y")
      }
    }
  }
}
