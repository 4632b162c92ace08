package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.plans.IdaTransform

/** The reference Transform stage on an ODS-shaped fixture (FIXTURES.md §A1):
  * merged-cell forward fill, unpivot, cleaning, standardization, locale
  * parse, dirty-cell drops. */
class IdaTransformSpec extends SparkSpec {

  private def wideFixture = {
    val schema = StructType(Seq(
      StructField("row_idx", LongType),
      StructField("GRUPO_ECONOMICO", StringType),
      StructField("VARIAVEL", StringType),
      StructField("2017-01", StringType),
      StructField("2017-02", StringType),
      StructField("SERVICO", StringType),
      StructField("ARQUIVO_ORIGEM", StringType)))
    val rows = Seq(
      Row(0L, "CLARO  S.A.", "Taxa de Respondidas em 5 dias Úteis", "85,3", "90", "SMP", "SMP_2017.ods"),
      Row(1L, null, "Taxa de Reabertas", "12,5%", "-", "SMP", "SMP_2017.ods"),
      Row(2L, null, "Quantidade de Respondidas", "", "1234", "SMP", "SMP_2017.ods"),
      Row(3L, "TIM S.A.", "Taxa de Respondidas em 5 dias Úteis", "77,0", null, "SMP", "SMP_2017.ods"),
      Row(4L, "nan", "Taxa de Reabertas", "50", "60", "SMP", "SMP_2017.ods"),
      Row(5L, "OUTRA OPERADORA", "Métrica Desconhecida", "1,5", "2,5", "SMP", "SMP_2017.ods"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  lazy val out = IdaTransform.rawWideToRecords(wideFixture)
    .orderBy("linha_origem", "ano_mes").collect()

  test("forward-fill propagates merged-cell group names (W3)") {
    val r1 = out.filter(r => r.getAs[Long]("linha_origem") == 1L)
    assert(r1.nonEmpty && r1.forall(_.getAs[String]("grupo_economico") == "CLARO"))
  }

  test("group + variable standardization applied after whitespace clean (F9/F10/F11)") {
    // "CLARO  S.A." has a double space: cleanText collapses it, then the map hits
    val r0 = out.find(r => r.getAs[Long]("linha_origem") == 0L).get
    assert(r0.getAs[String]("grupo_economico") == "CLARO")
    assert(r0.getAs[String]("variavel") == "TAXA_RESP_5DIAS")
    // unknown names pass through unchanged
    val r5 = out.find(r => r.getAs[Long]("linha_origem") == 5L).get
    assert(r5.getAs[String]("grupo_economico") == "OUTRA OPERADORA")
    assert(r5.getAs[String]("variavel") == "Métrica Desconhecida")
  }

  test("locale parse: comma decimal, % strip, dirty cells dropped (F12/P2)") {
    val r0 = out.filter(_.getAs[Long]("linha_origem") == 0L)
    assert(r0.map(_.getAs[Double]("valor")).toSeq == Seq(85.3, 90.0))
    // row 1: '12,5%' -> 12.5 kept; '-' dropped
    val r1 = out.filter(_.getAs[Long]("linha_origem") == 1L)
    assert(r1.map(_.getAs[Double]("valor")).toSeq == Seq(12.5))
    // row 2: '' dropped, '1234' kept
    val r2 = out.filter(_.getAs[Long]("linha_origem") == 2L)
    assert(r2.map(_.getAs[Double]("valor")).toSeq == Seq(1234.0))
  }

  test("'nan' group rows are filtered (P1)") {
    assert(!out.exists(_.getAs[Long]("linha_origem") == 4L))
  }

  test("month columns become month-start dates (F13/P3)") {
    val dates = out.map(_.getAs[java.sql.Date]("ano_mes").toString).distinct.sorted
    assert(dates.toSeq == Seq("2017-01-01", "2017-02-01"))
  }
}
