package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.functions.Fns

/** Warehouse DDL + seed data + health check — the reference's init path
  * (SURVEY.md §2.1 S9/S10/S11) as programmatic StructTypes and literal seed
  * builders instead of executed SQL strings.
  *
  * Mirrors /root/reference/schema_star.sql:14-101 (DDL) and :198-268 (seeds).
  * VARCHAR lengths and CHECK constraints don't exist in Spark's type system;
  * they become test assertions (SURVEY §1.2).
  */
object MartSchema {

  val dimTempoSchema: StructType = StructType(Seq(
    StructField("tempo_key", IntegerType, nullable = false),
    StructField("ano_mes", DateType, nullable = false),
    StructField("ano", IntegerType, nullable = false),
    StructField("mes", IntegerType, nullable = false),
    StructField("mes_nome", StringType, nullable = false),
    StructField("trimestre", IntegerType, nullable = false),
    StructField("semestre", IntegerType, nullable = false)))

  val dimGrupoSchema: StructType = StructType(Seq(
    StructField("grupo_key", IntegerType, nullable = false),
    StructField("grupo_codigo", StringType, nullable = false),
    StructField("grupo_nome", StringType),
    StructField("grupo_normalizado", StringType),
    StructField("ativo", BooleanType, nullable = false)))

  val dimServicoSchema: StructType = StructType(Seq(
    StructField("servico_key", IntegerType, nullable = false),
    StructField("servico_codigo", StringType, nullable = false),
    StructField("servico_nome", StringType),
    StructField("servico_descricao", StringType),
    StructField("ativo", BooleanType, nullable = false)))

  val dimVariavelSchema: StructType = StructType(Seq(
    StructField("variavel_key", IntegerType, nullable = false),
    StructField("variavel_codigo", StringType, nullable = false),
    StructField("variavel_nome", StringType),
    StructField("variavel_descricao", StringType),
    StructField("unidade_medida", StringType),
    StructField("peso_ida", IntegerType),
    StructField("meta_anatel", DecimalType(10, 3)),
    StructField("is_principal", BooleanType, nullable = false),
    StructField("ativo", BooleanType, nullable = false)))

  /** fato_key (BIGINT GENERATED ALWAYS AS IDENTITY, schema_star.sql:83) is
    * deliberately NOT produced by the engine's load path: Spark tables need
    * no synthetic row identity, and a global identity would force a total
    * order. hash_registro is the durable row identity instead. The DDL
    * mirror keeps the column (nullable) for reference fidelity;
    * `IdaMartSpec` asserts the load output conforms to this schema minus
    * fato_key. */
  val factSchema: StructType = StructType(Seq(
    StructField("fato_key", LongType),
    StructField("tempo_key", IntegerType, nullable = false),
    StructField("grupo_key", IntegerType, nullable = false),
    StructField("servico_key", IntegerType, nullable = false),
    StructField("variavel_key", IntegerType, nullable = false),
    StructField("valor", DecimalType(15, 6), nullable = false),
    StructField("arquivo_origem", StringType),
    StructField("linha_origem", LongType),
    StructField("data_processamento", TimestampType),
    StructField("hash_registro", StringType, nullable = false)))

  /** S10: 36 pre-seeded months 2017-01..2019-12 (schema_star.sql:198-235),
    * derived attrs computed exactly like the loader (etl_ida.py:574-587). */
  def seedDimTempo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for (ano <- 2017 to 2019; mes <- 1 to 12) yield {
      val key = (ano - 2017) * 12 + mes
      (key, java.sql.Date.valueOf(f"$ano-$mes%02d-01"), ano, mes,
        ptBrMonthNames(mes - 1), (mes - 1) / 3 + 1, (mes - 1) / 6 + 1)
    }
    rows.toDF("tempo_key", "ano_mes", "ano", "mes", "mes_nome", "trimestre",
      "semestre")
  }

  val ptBrMonthNames: Seq[String] = Seq("Janeiro", "Fevereiro", "Março",
    "Abril", "Maio", "Junho", "Julho", "Agosto", "Setembro", "Outubro",
    "Novembro", "Dezembro")

  /** S10: the 10 seeded economic groups (schema_star.sql:237-248). */
  def seedDimGrupo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("ALGAR", "ALGAR TELECOM S/A", "ALGAR"),
      ("CLARO", "CLARO S.A.", "CLARO"),
      ("VIVO", "TELEFÔNICA BRASIL S.A.", "VIVO"),
      ("TIM", "TIM S.A.", "TIM"),
      ("OI", "OI S.A.", "OI"),
      ("NET", "NET SERVIÇOS DE COMUNICAÇÃO S.A.", "NET"),
      ("SKY", "SKY BRASIL SERVIÇOS LTDA.", "SKY"),
      ("EMBRATEL", "EMPRESA BRASILEIRA DE TELECOMUNICAÇÕES S.A.", "EMBRATEL"),
      ("NEXTEL", "NEXTEL TELECOMUNICAÇÕES LTDA.", "NEXTEL"),
      ("SERCOMTEL", "SERCOMTEL S/A TELECOMUNICAÇÕES", "SERCOMTEL"))
      .zipWithIndex
      .map { case ((c, n, norm), i) => (i + 1, c, n, norm, true) }
      .toDF("grupo_key", "grupo_codigo", "grupo_nome", "grupo_normalizado",
        "ativo")
  }

  /** S10: the 3 seeded services (schema_star.sql:250-254). */
  def seedDimServico(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("SMP", "Serviço Móvel Pessoal", "Telefonia móvel celular"),
      ("STFC", "Serviço Telefônico Fixo Comutado", "Telefonia fixa"),
      ("SCM", "Serviço de Comunicação Multimídia", "Banda larga fixa"))
      .zipWithIndex
      .map { case ((c, n, d), i) => (i + 1, c, n, d, true) }
      .toDF("servico_key", "servico_codigo", "servico_nome",
        "servico_descricao", "ativo")
  }

  /** S10: the 11 seeded metrics; TAXA_RESP_5DIAS is the principal one
    * (schema_star.sql:256-268). */
  def seedDimVariavel(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("IDA", "Indicador de Desempenho no Atendimento (IDA)", "pontos", false),
      ("INDICE_RECL", "Índice de Reclamações", "por mil", false),
      ("QTD_ACESSOS", "Quantidade de acessos em serviço", "unidades", false),
      ("QTD_REABERTAS", "Quantidade de reabertas", "unidades", false),
      ("QTD_RECLAMACOES", "Quantidade de reclamações", "unidades", false),
      ("QTD_RECL_PERIODO", "Quantidade de Reclamações no Período", "unidades", false),
      ("QTD_RESPONDIDAS", "Quantidade de Respondidas", "unidades", false),
      ("QTD_RESP_5DIAS", "Quantidade de Sol. Respondidas em até 5 dias", "unidades", false),
      ("TAXA_REABERTAS", "Taxa de Reabertas", "percentual", false),
      ("TAXA_RESP_5DIAS", "Taxa de Respondidas em 5 dias Úteis", "percentual", true),
      ("TAXA_RESP_PERIODO", "Taxa de Respondidas no Período", "percentual", false))
      .zipWithIndex
      .map { case ((c, n, u, p), i) =>
        (i + 1, c, n, null.asInstanceOf[String], u,
          null.asInstanceOf[Integer], null.asInstanceOf[java.math.BigDecimal],
          p, true)
      }
      .toDF("variavel_key", "variavel_codigo", "variavel_nome",
        "variavel_descricao", "unidade_medida", "peso_ida", "meta_anatel",
        "is_principal", "ativo")
      .withColumn("meta_anatel",
        org.apache.spark.sql.functions.col("meta_anatel").cast(DecimalType(10, 3)))
  }

  /** S9: register the whole mart (seeds) as temp views — the Spark analog of
    * executing the DDL + seed script. */
  def createMart(spark: SparkSession): Unit = {
    seedDimTempo(spark).createOrReplaceTempView("dim_tempo")
    seedDimGrupo(spark).createOrReplaceTempView("dim_grupo_economico")
    seedDimServico(spark).createOrReplaceTempView("dim_servico")
    seedDimVariavel(spark).createOrReplaceTempView("dim_variavel")
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      factSchema).createOrReplaceTempView("fact_ida")
  }

  /** S11: health-check probe — schema + SELECT 1 ... LIMIT 1 per table
    * (/root/reference/etl/etl_ida.py:630-651). */
  def healthCheck(spark: SparkSession,
                  tables: Seq[String] = Seq("dim_tempo", "dim_grupo_economico",
                    "dim_servico", "dim_variavel", "fact_ida")): Map[String, Boolean] =
    tables.map { t =>
      t -> (spark.catalog.tableExists(t) && {
        scala.util.Try(spark.table(t).limit(1).count()).isSuccess
      })
    }.toMap
}
