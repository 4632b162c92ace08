package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns._
import graft.operators.Reshape
import graft.sources.Probe

/** The reference's Transform stage end-to-end
  * (/root/reference/etl/etl_ida.py:293-378): an ODS-shaped wide frame
  * (FIXTURES.md §A1) -> normalized DataRecords (§A2).
  *
  * Stage order preserved from the reference:
  *  1. W3 forward-fill of merged-cell group names (etl_ida.py:249) — within
  *     the source file partition, ordered by the explicit row index;
  *  2. R1 unpivot of the month columns (etl_ida.py:315-378) — month columns
  *     discovered by the P3 predicate on column names;
  *  3. P1 null/blank row filter on grupo/variavel (etl_ida.py:316-327);
  *  4. F9-F11 text clean + name standardization;
  *  5. F13 month-date normalization ('YYYY-MM' -> month-start date);
  *  6. F12 locale number parse; P2 drops unparseable cells ('-', '', NaN).
  *
  * Everything is a narrow transformation — no shuffle at any step (the
  * forward-fill window partitions by source file, which is how the data
  * arrives). At 100 TB this pipeline is embarrassingly parallel.
  */
object IdaTransform {

  /** Expected id columns of the wide frame (FIXTURES.md §A1). */
  val idCols: Seq[String] =
    Seq("row_idx", "GRUPO_ECONOMICO", "VARIAVEL", "SERVICO", "ARQUIVO_ORIGEM")

  def rawWideToRecords(wide: DataFrame): DataFrame = {
    val months = Probe.monthColumns(wide)
    require(months.nonEmpty, "no YYYY-MM month columns found (P3)")
    val filled = Reshape.forwardFill(wide, orderCol = "row_idx",
      fillCols = Seq("GRUPO_ECONOMICO"), partitionCols = Seq("ARQUIVO_ORIGEM"))
    val long = Reshape.unpivot(filled, ids = idCols, values = months,
      variableCol = "mes_col", valueCol = "valor_bruto")
    long
      .withColumn("grupo_limpo", cleanText(col("GRUPO_ECONOMICO")))
      .withColumn("variavel_limpa", cleanText(col("VARIAVEL")))
      .filter(col("grupo_limpo").isNotNull && col("grupo_limpo") =!= "" &&
        lower(col("grupo_limpo")) =!= "nan" &&
        col("variavel_limpa").isNotNull && col("variavel_limpa") =!= "" &&
        lower(col("variavel_limpa")) =!= "nan")                    // P1
      .select(
        to_date(concat(substring(col("mes_col"), 1, 7), lit("-01")))
          .as("ano_mes"),                                          // F13
        standardizeGroup(col("grupo_limpo")).as("grupo_economico"), // F10
        cleanText(col("SERVICO")).as("servico"),
        standardizeVariable(col("variavel_limpa")).as("variavel"),  // F11
        parseLocaleNumber(col("valor_bruto")).as("valor"),          // F12
        col("ARQUIVO_ORIGEM").as("arquivo_origem"),
        col("row_idx").as("linha_origem"))
      .filter(col("valor").isNotNull && col("ano_mes").isNotNull)   // P2
  }
}
