package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns._
import graft.operators.Reshape
import graft.plans.{IdaMart, TaxaVariacao}
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-oracle `oracleSql` twin.
  *
  * Conventions (cross-engine exactness, see Fns):
  *  - aggregates of double measures go through DECIMAL(18,6) and emit DOUBLE;
  *  - every query ends in a total-order ORDER BY mirrored in the oracle;
  *  - all computed columns are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query (vw_taxa_variacao analog) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    TaxaVariacao(spark, "/root/testdata/sf0.001")

  /** pt-BR month-name CASE for oracle SQL (mirrors Fns.ptBrMonthName). */
  private val mesNomeSql: String =
    "CASE mes " + Seq("Janeiro", "Fevereiro", "Março", "Abril", "Maio",
      "Junho", "Julho", "Agosto", "Setembro", "Outubro", "Novembro",
      "Dezembro").zipWithIndex
      .map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }
      .mkString(" ") + " END"

  /** Shared SQL: normalized records from orders (IdaMart.records). */
  private val recordsSql: String =
    """SELECT date_trunc('month', o_orderdate) AS ano_mes,
      |       o_orderpriority AS grupo_economico,
      |       o_orderstatus AS servico,
      |       'TOTALPRICE' AS variavel,
      |       o_totalprice AS valor,
      |       'orders.parquet' AS arquivo_origem,
      |       o_orderkey AS linha_origem
      |FROM orders""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- flagship: SURVEY §3 E3 (J1-J4, P4-P5, A1-A3, W1-W2, F1-F6, O1)
    "flagship_taxa_variacao" -> ((s, dir) => TaxaVariacao(s, dir)),

    // ----- A1/A2-class aggregation (TPC-H Q1 shape) on lineitem
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base_price"),
          sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          avgExact(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // ----- J1/J2-class star join: orders |X| customer |X| nation |X| region
    "j1_star_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"), year(col("o_orderdate")).as("ano"))
        .agg(sumExact(col("o_totalprice")).as("receita"),
             count(lit(1)).as("n_pedidos"))
        .orderBy(col("r_name"), col("n_name"), col("ano"))
    }),

    // ----- S8/A4: dim_tempo build (distinct + surrogate keys + F14/F15)
    "s8_dim_tempo" -> ((s, dir) =>
      IdaMart.dimTempo(IdaMart.records(s, dir)).orderBy(col("tempo_key"))),

    // ----- R1: unpivot lineitem measures wide -> long
    "r1_unpivot" -> ((s, dir) =>
      Reshape.unpivot(
        Tables.lineitem(s, dir).filter(col("l_orderkey") % 100 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")),
        ids = Seq("l_orderkey", "l_linenumber"),
        values = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("variavel"))),

    // ----- W3: forward-fill (pandas ffill analog) over events
    "w3_forward_fill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("value", when(col("event_id") % 7 === 0, lit(null))
          .otherwise(col("value")))
      Reshape.forwardFill(ev, orderCol = "event_id", fillCols = Seq("value"),
          partitionCols = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    }),

    // ----- S7/J3/F8: idempotent fact load — loading the same batch twice
    // yields the single-load fact (ON CONFLICT DO NOTHING semantics)
    "s7_fact_load" -> ((s, dir) => {
      val recs = IdaMart.records(s, dir)
      val doubled = recs.unionAll(recs)                     // U1 bag union
      IdaMart.fact(s, doubled)
        .select(col("tempo_key"), col("grupo_key"), col("servico_key"),
          col("variavel_key"), col("valor").cast("double").as("valor"),
          col("arquivo_origem"), col("linha_origem"), col("hash_registro"))
        .orderBy(col("hash_registro"))
    }),

    // ----- P1/F9: blank filter + whitespace-collapse clean on documents
    "p1_clean_filter" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"), cleanText(col("text")).as("texto_limpo"),
          upper(col("lang")).as("lang"))
        .orderBy(col("doc_id"))),

    // ----- F12/P2: locale number parse on synthesized dirty strings
    "f12_locale_parse" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("bruto",
          when(col("event_id") % 11 === 0, lit("-"))
            .when(col("event_id") % 13 === 0, lit(""))
            .otherwise(concat(
              regexp_replace(col("value").cast("string"), "\\.", ","),
              lit("%"))))
        .select(col("event_id"), col("bruto"),
          parseLocaleNumber(col("bruto")).as("valor"))
        .filter(col("valor").isNotNull)                      // P2
        .orderBy(col("event_id"))),

    // ----- left-semi join: customers with at least one pending order
    "j_semi" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ----- left-anti join: customers with no pending order
    "j_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // ----- O1-class top-k with deterministic tiebreak
    "o1_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // ----- U1: set union (distinct) across heterogeneous sources
    "u1_union" -> ((s, dir) =>
      Tables.orders(s, dir).select(col("o_orderpriority").as("nome"))
        .unionByName(Tables.events(s, dir).select(col("event_type").as("nome")))
        .distinct()
        .orderBy(col("nome"))),

    // ----- A4/A5: distinct-set extraction + run statistics counters
    "a4_distinct_stats" -> ((s, dir) =>
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_records"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(monthKey(col("o_orderdate"))).as("n_months"),
        countDistinct(col("o_orderpriority")).as("n_groups"))),

    // ----- R2: manual pivot (MAX/AVG of CASE) — daily series per event type
    "r2_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val aggs = types.map { t =>
        (sum(when(col("event_type") === t, dec(col("value")))).cast("double") /
          count(when(col("event_type") === t, lit(1)))).as(t)
      }
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dia"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("dia"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "flagship_taxa_variacao" -> TaxaVariacao.oracleSql,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "j1_star_join" ->
      """SELECT r_name, n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS ano,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS receita,
        |  COUNT(*) AS n_pedidos
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name, ano
        |ORDER BY r_name, n_name, ano""".stripMargin,

    "s8_dim_tempo" ->
      s"""WITH months AS (
         |  SELECT DISTINCT date_trunc('month', o_orderdate) AS ano_mes FROM orders
         |), base AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY ano_mes) AS INTEGER) AS tempo_key,
         |         CAST(ano_mes AS DATE) AS ano_mes,
         |         CAST(EXTRACT(year FROM ano_mes) AS INTEGER) AS ano,
         |         CAST(EXTRACT(month FROM ano_mes) AS INTEGER) AS mes,
         |         CAST(EXTRACT(quarter FROM ano_mes) AS INTEGER) AS trimestre,
         |         CAST(FLOOR((EXTRACT(month FROM ano_mes) - 1) / 6) + 1 AS INTEGER) AS semestre
         |  FROM months
         |)
         |SELECT tempo_key, ano_mes, ano, mes, $mesNomeSql AS mes_nome,
         |       trimestre, semestre
         |FROM base ORDER BY tempo_key""".stripMargin,

    "r1_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |         l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey % 100 = 0
        |)
        |SELECT l_orderkey, l_linenumber, variavel, valor FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS variavel, l_quantity AS valor FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
        |)
        |ORDER BY l_orderkey, l_linenumber, variavel""".stripMargin,

    "w3_forward_fill" ->
      """SELECT event_id, user_id,
        |  LAST_VALUE(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "s7_fact_load" ->
      s"""WITH records AS ($recordsSql),
         |doubled AS (SELECT * FROM records UNION ALL SELECT * FROM records),
         |dim_tempo AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY ano_mes) AS INTEGER) AS tempo_key, ano_mes
         |  FROM (SELECT DISTINCT ano_mes FROM records)
         |), dim_grupo AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY grupo_economico) AS INTEGER) AS grupo_key,
         |         grupo_economico
         |  FROM (SELECT DISTINCT grupo_economico FROM records)
         |), dim_servico AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY servico) AS INTEGER) AS servico_key, servico
         |  FROM (SELECT DISTINCT servico FROM records)
         |), dim_variavel AS (SELECT 1 AS variavel_key, 'TOTALPRICE' AS variavel),
         |hashed AS (
         |  SELECT *,
         |    md5(strftime(ano_mes, '%Y-%m-%d') || '|' || grupo_economico || '|' ||
         |        servico || '|' || variavel || '|' ||
         |        CAST(CAST(valor AS DECIMAL(18,2)) AS VARCHAR)) AS hash_registro
         |  FROM doubled
         |), deduped AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY hash_registro ORDER BY linha_origem) AS rn
         |    FROM hashed) WHERE rn = 1
         |)
         |SELECT t.tempo_key, g.grupo_key, s.servico_key, v.variavel_key,
         |       CAST(CAST(d.valor AS DECIMAL(15,6)) AS DOUBLE) AS valor,
         |       d.arquivo_origem, d.linha_origem, d.hash_registro
         |FROM deduped d
         |JOIN dim_tempo t USING (ano_mes)
         |JOIN dim_grupo g ON d.grupo_economico = g.grupo_economico
         |JOIN dim_servico s ON d.servico = s.servico
         |JOIN dim_variavel v ON d.variavel = v.variavel
         |ORDER BY d.hash_registro""".stripMargin,

    "p1_clean_filter" ->
      """SELECT doc_id,
        |  regexp_replace(trim(text), '\s+', ' ', 'g') AS texto_limpo,
        |  upper(lang) AS lang
        |FROM documents
        |WHERE text IS NOT NULL AND trim(text) <> ''
        |ORDER BY doc_id""".stripMargin,

    "f12_locale_parse" ->
      """WITH dirty AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 11 = 0 THEN '-'
        |         WHEN event_id % 13 = 0 THEN ''
        |         ELSE replace(CAST(value AS VARCHAR), '.', ',') || '%'
        |    END AS bruto
        |  FROM events
        |)
        |SELECT event_id, bruto,
        |  TRY_CAST(replace(replace(trim(bruto), '%', ''), ',', '.') AS DOUBLE) AS valor
        |FROM dirty
        |WHERE TRY_CAST(replace(replace(trim(bruto), '%', ''), ',', '.') AS DOUBLE) IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "j_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "j_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "o1_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "u1_union" ->
      """SELECT nome FROM (
        |  SELECT o_orderpriority AS nome FROM orders
        |  UNION
        |  SELECT event_type FROM events
        |) ORDER BY nome""".stripMargin,

    "a4_distinct_stats" ->
      """SELECT COUNT(*) AS n_records,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months,
        |  COUNT(DISTINCT o_orderpriority) AS n_groups
        |FROM orders""".stripMargin,

    "r2_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map { t =>
        s"""  CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
           |    / COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t""".stripMargin
      }.mkString(",\n")
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dia,
         |$cols
         |FROM events
         |GROUP BY dia
         |ORDER BY dia""".stripMargin
    }
  )
}
