package graft

import org.apache.spark.sql.functions._

import graft.plans.TaxaVariacao

/** Flagship vw_taxa_variacao semantics (SURVEY §3 E3). */
class FlagshipSpec extends SparkSpec {

  lazy val out = TaxaVariacao(spark, sf0001).cache()

  test("returns rows and the fixed pivot schema") {
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("mes", "taxa_variacao_media") ++
      TaxaVariacao.groups.map(_._2))
  }

  test("first month is dropped (P5 after W1)") {
    val allMonths = graft.sources.Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mes"))
      .agg(min("mes")).first().getString(0)
    val firstOut = out.agg(min("mes")).first().getString(0)
    assert(firstOut > allMonths)
  }

  test("month keys sort chronologically as strings (F1)") {
    val meses = out.select("mes").collect().map(_.getString(0))
    assert(meses.toSeq == meses.sorted.toSeq)
  }

  test("SQL front door (spark.sql) matches the DataFrame plan exactly") {
    graft.sources.Tables.orders(spark, sf0001)
      .createOrReplaceTempView("orders")
    val viaSql = spark.sql(TaxaVariacao.sparkSql).collect()
    val viaDf = out.collect()
    assert(viaSql.length == viaDf.length)
    viaSql.zip(viaDf).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"sql=$a df=$b")
    }
  }

  test("typed Dataset[DataRecord] view exposes the same rows") {
    val typed = graft.plans.IdaMart.recordsTyped(spark, sf0001)
    val n = typed.filter(_.grupo_economico.nonEmpty).count()
    assert(n == graft.plans.IdaMart.records(spark, sf0001).count())
    val one = typed.head()
    assert(one.variavel == "TOTALPRICE" && one.arquivo_origem == "orders.parquet")
  }
}
