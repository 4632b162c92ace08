package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Fns

/** Scalar function library (SURVEY §2.8): unit + property tests. */
class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("pctChange: NULL on zero or NULL previous (F3/F5)") {
    val df = Seq((110.0, 100.0), (50.0, 0.0), (3.0, Double.NaN))
      .toDF("cur", "prev")
      .withColumn("prev", when(isnan(col("prev")), lit(null)).otherwise(col("prev")))
      .select(Fns.pctChange(col("cur"), col("prev")).as("pct"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).contains(10.000000000000009) || got(0).exists(v =>
      math.abs(v.asInstanceOf[Double] - 10.0) < 1e-9))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("parseLocaleNumber: comma decimals, %, garbage -> null (F12)") {
    val df = Seq("85,3", "12,5%", "-", "", "abc", " 7,25 % ", "42")
      .toDF("raw").select(Fns.parseLocaleNumber(col("raw")).as("v"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).contains(85.3) && got(1).contains(12.5))
    assert(got(2).isEmpty && got(3).isEmpty && got(4).isEmpty)
    assert(got(5).contains(7.25) && got(6).contains(42.0))
  }

  test("parseLocaleNumber is total: never throws on arbitrary strings (property)") {
    val gen = Gen.listOfN(200, Gen.asciiPrintableStr)
    val ss = gen.apply(Gen.Parameters.default, Seed(42L)).get
    val n = ss.toDF("raw").select(Fns.parseLocaleNumber(col("raw")).as("v"))
      .count()
    assert(n == ss.length)
  }

  test("ptBrMonthName: literal map, not locale-dependent (F15)") {
    val got = Seq(1, 3, 12).toDF("m")
      .select(Fns.ptBrMonthName(col("m")).as("n")).as[String].collect()
    assert(got.toSeq == Seq("Janeiro", "Março", "Dezembro"))
  }

  test("semestre/trimestre derivations (F14)") {
    val got = (1 to 12).toDF("m")
      .select(to_date(format_string("2020-%02d-01", col("m"))).as("d"))
      .select(Fns.trimestre(col("d")).as("t"), Fns.semestre(col("d")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.map(_._1).toSeq == Seq(1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
    assert(got.map(_._2).toSeq == Seq(1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2))
  }

  test("recordHash: stable and field-order sensitive (F8)") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val h1 = df.select(Fns.recordHash(col("x"), col("y"))).first().getString(0)
    val h2 = df.select(Fns.recordHash(col("x"), col("y"))).first().getString(0)
    val h3 = df.select(Fns.recordHash(col("y"), col("x"))).first().getString(0)
    assert(h1 == h2 && h1 != h3 && h1.length == 32)
  }

  test("cleanText collapses internal whitespace (F9)") {
    val got = Seq("  a \t b\n c  ").toDF("t")
      .select(Fns.cleanText(col("t"))).first().getString(0)
    assert(got == "a b c")
  }

  test("standardize: known names mapped, unknown pass through (F10/F11)") {
    val got = Seq("CLARO S.A.", "WHO KNOWS").toDF("g")
      .select(Fns.standardizeGroup(col("g")).as("s")).as[String].collect()
    assert(got.toSeq == Seq("CLARO", "WHO KNOWS"))
  }
}
