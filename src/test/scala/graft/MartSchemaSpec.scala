package graft

import org.apache.spark.sql.functions._

import graft.plans.MartSchema

/** S9/S10/S11: seed content + the reference's CHECK constraints as
  * assertions (schema_star.sql:23-26). */
class MartSchemaSpec extends SparkSpec {

  test("dim_tempo seed: 36 months with valid CHECK ranges") {
    val dt = MartSchema.seedDimTempo(spark)
    assert(dt.count() == 36)
    assert(dt.filter(col("mes") < 1 || col("mes") > 12).count() == 0)
    assert(dt.filter(col("trimestre") < 1 || col("trimestre") > 4).count() == 0)
    assert(dt.filter(col("semestre") < 1 || col("semestre") > 2).count() == 0)
    assert(dt.select("ano_mes").distinct().count() == 36) // UNIQUE natural key
    val jan17 = dt.filter(col("tempo_key") === 1).collect().head
    assert(jan17.getAs[String]("mes_nome") == "Janeiro")
    assert(jan17.getAs[java.sql.Date]("ano_mes").toString == "2017-01-01")
  }

  test("dim seeds: 10 groups, 3 services, 11 variables, principal flag") {
    assert(MartSchema.seedDimGrupo(spark).count() == 10)
    assert(MartSchema.seedDimServico(spark).count() == 3)
    val dv = MartSchema.seedDimVariavel(spark)
    assert(dv.count() == 11)
    val principal = dv.filter(col("is_principal")).collect()
    assert(principal.length == 1 &&
      principal.head.getAs[String]("variavel_codigo") == "TAXA_RESP_5DIAS")
  }

  test("createMart + healthCheck: all tables probe healthy (S11)") {
    MartSchema.createMart(spark)
    val health = MartSchema.healthCheck(spark)
    assert(health.size == 5 && health.values.forall(identity))
  }

  test("healthCheck reports missing table") {
    val health = MartSchema.healthCheck(spark, Seq("no_such_table"))
    assert(health("no_such_table") == false)
  }
}
