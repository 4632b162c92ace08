package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Pins the generated (doGenCode) path of the vector expressions to the
  * interpreted (nullSafeEval) path: `spark.sql.codegen.factoryMode` is the
  * switch Spark's own expression suites use — CODEGEN_ONLY must compile and
  * run our generated Java (a fallback would throw), NO_CODEGEN runs the
  * interpreted twin, and the two must agree cell for cell, including the
  * null contract (length mismatch, null element, zero norm). */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val FactoryMode = "spark.sql.codegen.factoryMode"

  private def withFactoryMode[T](mode: String)(body: => T): T = {
    val prev = spark.conf.getOption(FactoryMode)
    spark.conf.set(FactoryMode, mode)
    try body finally prev match {
      case Some(v) => spark.conf.set(FactoryMode, v)
      case None => spark.conf.unset(FactoryMode)
    }
  }

  private val planes: Seq[Seq[Double]] =
    Seq(Seq(1.0, -2.0, 0.5, 3.0), Seq(-1.0, 0.0, 2.0, -0.25),
      Seq(0.0, 1.0, 1.0, 1.0), Seq(2.0, -1.0, -1.0, 0.0))

  /** Mixed fixture: normal rows, a null element, a length mismatch, a zero
    * vector, a null array — every branch of the generated code. */
  private def fixture: DataFrame = {
    val rows: Seq[(Int, Array[java.lang.Float], Array[java.lang.Float])] = Seq(
      (0, Array[java.lang.Float](1f, 2f, 3f, 4f), Array[java.lang.Float](4f, 3f, 2f, 1f)),
      (1, Array[java.lang.Float](-1f, 0.5f, 2f, -3f), Array[java.lang.Float](2f, 2f, 2f, 2f)),
      (2, Array[java.lang.Float](1f, null, 3f, 4f), Array[java.lang.Float](1f, 2f, 3f, 4f)),
      (3, Array[java.lang.Float](1f, 2f), Array[java.lang.Float](1f, 2f, 3f, 4f)),
      (4, Array[java.lang.Float](0f, 0f, 0f, 0f), Array[java.lang.Float](1f, 1f, 1f, 1f)),
      (5, null, Array[java.lang.Float](1f, 1f, 1f, 1f)))
    rows.toDF("id", "a", "b")
  }

  private def evalAll(mode: String): Array[(Int, Option[Double], Option[Double], Option[Long])] =
    withFactoryMode(mode) {
      fixture.select(col("id"),
          VectorFns.dot(col("a"), col("b")).as("d"),
          VectorFns.cosine(col("a"), col("b")).as("c"),
          VectorFns.hyperplaneSig(col("a"), planes).as("s"))
        .collect()
        .map(r => (r.getInt(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sortBy(_._1)
    }

  test("generated path == interpreted path, cell for cell") {
    val gen = evalAll("CODEGEN_ONLY")
    val interp = evalAll("NO_CODEGEN")
    assert(gen.toSeq == interp.toSeq)
  }

  test("generated path honours the null contract") {
    val byId = evalAll("CODEGEN_ONLY").map(t => t._1 -> t).toMap
    // row 0: plain values
    assert(byId(0)._2.contains(1.0 * 4 + 2 * 3 + 3 * 2 + 4 * 1))
    // row 2: null element -> null dot AND null cosine (not silent zero)
    assert(byId(2)._2.isEmpty && byId(2)._3.isEmpty)
    // ... but the LSH signature treats null elements as 0, stays non-null
    assert(byId(2)._4.nonEmpty)
    // row 3: length mismatch -> null
    assert(byId(3)._2.isEmpty && byId(3)._3.isEmpty)
    // row 4: zero norm -> null cosine, zero dot
    assert(byId(4)._2.contains(0.0) && byId(4)._3.isEmpty)
    // row 5: null array -> all null
    assert(byId(5)._2.isEmpty && byId(5)._3.isEmpty && byId(5)._4.isEmpty)
  }

  test("cosine filter stays inside one WholeStageCodegen span") {
    // a real parquet scan: a local Seq would constant-fold to LocalTableScan
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val df = emb
      .filter(VectorFns.cosine(col("embedding"), col("embedding")) > lit(0.5))
      .select(col("vec_id"))
    val plan = df.queryExecution.executedPlan
    val spans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(spans.nonEmpty, s"no WholeStageCodegen in:\n$plan")
    // the filter must sit INSIDE a span, not dangle outside it
    val outsideFilter = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    val insideFilter = spans.flatMap(_.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f })
    assert(outsideFilter.size == insideFilter.size,
      s"filter left outside codegen:\n$plan")
  }
}
