package graft

import org.apache.spark.sql.functions._

import graft.plans.IdaMart
import graft.sources.JdbcSink

/** The executed JDBC load boundary (embedded Derby): replay idempotency,
  * REAL primary-key enforcement, and the read-back round trip. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(name: String): String = {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        System.getProperty("java.io.tmpdir"))
    val dir = java.nio.file.Files.createTempDirectory(s"derby-$name")
    dir.resolve("db").toString
  }

  test("loadIdempotent: replaying the same batch appends zero rows") {
    val db = freshDb("replay")
    val url = s"jdbc:derby:$db;create=true"
    try {
      JdbcSink.ensureFactTable(url)
      val fact = IdaMart.fact(IdaMart.records(spark, sf0001))
        .select(col("tempo_key"), col("grupo_key"), col("servico_key"),
          col("variavel_key"), col("valor"), col("arquivo_origem"),
          col("linha_origem"), col("hash_registro"))
      JdbcSink.loadIdempotent(fact, url, numPartitions = 3, batchSize = 100)
      val afterFirst = JdbcSink.readTable(spark, url).count()
      JdbcSink.loadIdempotent(fact, url, numPartitions = 3, batchSize = 100)
      val afterSecond = JdbcSink.readTable(spark, url).count()
      assert(afterFirst > 0)
      assert(afterSecond == afterFirst, "replay must append nothing")
      assert(afterFirst == fact.dropDuplicates("hash_registro").count())
    } finally JdbcSink.shutdownDerby(db)
  }

  test("the PRIMARY KEY is real: a raw duplicate append aborts") {
    val db = freshDb("pk")
    val url = s"jdbc:derby:$db;create=true"
    try {
      JdbcSink.ensureFactTable(url)
      val one = IdaMart.fact(IdaMart.records(spark, sf0001))
        .select(col("tempo_key"), col("grupo_key"), col("servico_key"),
          col("variavel_key"), col("valor"), col("arquivo_origem"),
          col("linha_origem"), col("hash_registro"))
        .limit(1)
      JdbcSink.loadIdempotent(one, url)
      // bypass the anti-join prefilter: plain append of the same row must
      // be REJECTED by the database, not silently double-loaded
      val ex = intercept[Exception] {
        val p = new java.util.Properties()
        p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
        one.write.mode("append").jdbc(url, "FACT_IDA", p)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(m =>
          m.contains("duplicate key") || m.contains("23505")),
        s"expected a duplicate-key violation, got: ${messages(ex)}")
      assert(JdbcSink.readTable(spark, url).count() == 1)
    } finally JdbcSink.shutdownDerby(db)
  }

  test("upsertDimGrupo: MERGE updates in place, inserts new codes, and " +
    "re-applying the same batch is idempotent") {
    val db = freshDb("merge")
    val url = s"jdbc:derby:$db;create=true"
    try {
      JdbcSink.ensureDimGrupoTables(url)
      val v1 = Seq(("A", "Alpha", "ALPHA", true), ("B", "Beta", "BETA", true))
        .toDF("grupo_codigo", "grupo_nome", "grupo_normalizado", "ativo")
      JdbcSink.upsertDimGrupo(v1, url)
      assert(JdbcSink.readTable(spark, url, "DIM_GRUPO").count() == 2)
      val v2 = Seq(("A", "Alpha v2", "ALPHA", true),
        ("C", "Gamma", "GAMMA", false))
        .toDF("grupo_codigo", "grupo_nome", "grupo_normalizado", "ativo")
      JdbcSink.upsertDimGrupo(v2, url)
      val after = JdbcSink.readTable(spark, url, "DIM_GRUPO")
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getBoolean(3)))
        .toMap
      assert(after.size == 3, "A updated, B untouched, C inserted")
      assert(after("A") == (("Alpha v2", true)))
      assert(after("B") == (("Beta", true)))
      assert(after("C") == (("Gamma", false)))
      JdbcSink.upsertDimGrupo(v2, url) // idempotent re-apply
      assert(JdbcSink.readTable(spark, url, "DIM_GRUPO").count() == 3)
    } finally JdbcSink.shutdownDerby(db)
  }

  test("round trip preserves values and types exactly") {
    val db = freshDb("types")
    val url = s"jdbc:derby:$db;create=true"
    try {
      JdbcSink.ensureFactTable(url)
      val fact = IdaMart.fact(IdaMart.records(spark, sf0001))
        .select(col("tempo_key"), col("grupo_key"), col("servico_key"),
          col("variavel_key"), col("valor"), col("arquivo_origem"),
          col("linha_origem"), col("hash_registro"))
      JdbcSink.loadIdempotent(fact, url)
      val back = JdbcSink.readTable(spark, url)
        .select(col("hash_registro").as("h"), col("valor"),
          col("linha_origem"))
      val expect = fact.dropDuplicates("hash_registro")
        .select(col("hash_registro").as("h"), col("valor"),
          col("linha_origem"))
      assert(back.count() == expect.count())
      assert(back.join(expect, Seq("h", "valor", "linha_origem")).count() ==
        expect.count(), "every (hash, valor, linha) must survive unchanged")
    } finally JdbcSink.shutdownDerby(db)
  }
}
