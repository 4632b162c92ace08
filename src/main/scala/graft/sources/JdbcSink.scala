package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's REAL load boundary — a SQL database over JDBC with ON
  * CONFLICT (hash) DO NOTHING semantics and a bounded connection pool
  * (/root/reference/etl/etl_ida.py:450-453 pool of 1-5, :461-554 batched
  * upsert) — executed through an actual JDBC driver: embedded Apache
  * Derby, which ships with Spark itself (/opt/spark/jars/derby-*.jar for
  * the Hive metastore), so the gate runs a genuine
  * `df.write.jdbc` → `spark.read.jdbc` round trip with zero added
  * dependencies.
  *
  * Knob mapping (the SCALE.md §"JDBC sink mapping" contract, now
  * executed rather than only documented):
  *  - `numPartitions` ⇔ the reference pool's max connections (5): Spark
  *    opens one DB connection per writing partition;
  *  - `batchsize` ⇔ the reference's `batch_size` (1000): rows per
  *    addBatch/executeBatch round trip;
  *  - ON CONFLICT DO NOTHING ⇔ read back the key column (column-pruned
  *    through the JDBC source), LEFT ANTI join, append — the
  *    [[graft.plans.IdaMart.load]] contract. The table carries a real
  *    PRIMARY KEY on the hash, so if the prefilter ever under-deduped the
  *    append would ABORT rather than silently double-load: the database
  *    enforces what the parquet gates can only assert.
  *
  * Scale: identical code drives PostgreSQL by swapping the URL/driver —
  * embedded Derby is the sandbox stand-in, the operator shape (anti-join
  * prefilter + partitioned batched append) is the deployable artifact.
  * The anti-join reads ONLY the key column; the append is re-runnable
  * after partial failure by construction (same idempotency property
  * `stream_ingest_exactly_once` proves for the file sink). */
object JdbcSink {

  /** DDL executor (the reference's schema-apply step, etl_ida.py's
    * `psql -f schema_star.sql` analog): explicit column types — letting
    * Spark's Derby dialect infer would map StringType to CLOB, which
    * Derby cannot index or compare. VARCHAR lengths follow
    * schema_star.sql:82-95. */
  def ensureFactTable(url: String, table: String = "FACT_IDA"): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, table, null)
      val exists = try meta.next() finally meta.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $table (
             |  tempo_key INT NOT NULL,
             |  grupo_key INT NOT NULL,
             |  servico_key INT NOT NULL,
             |  variavel_key INT NOT NULL,
             |  valor DECIMAL(15,6),
             |  arquivo_origem VARCHAR(150),
             |  linha_origem BIGINT,
             |  hash_registro VARCHAR(64) NOT NULL PRIMARY KEY
             |)""".stripMargin)
        finally st.close()
      }
    } finally conn.close()
  }

  private def props(): Properties = {
    val p = new Properties()
    // Derby's modern driver auto-loads via ServiceLoader; naming it keeps
    // the writer explicit about which driver each partition instantiates
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  /** Idempotent hash-keyed append: anti-join the batch against the keys
    * already in the table (read back THROUGH JDBC, pruned to the key
    * column), then append survivors with the pool/batch knobs. Loading
    * the same batch twice leaves the table equal to one load. */
  def loadIdempotent(batch: DataFrame, url: String, table: String = "FACT_IDA",
                     keyCol: String = "hash_registro",
                     numPartitions: Int = 5, batchSize: Int = 1000): Unit = {
    val spark = batch.sparkSession
    val existing = spark.read.jdbc(url, table, props())
      .select(col(keyCol))
    batch
      .join(existing, Seq(keyCol), "left_anti")
      .repartition(numPartitions) // ⇔ the reference pool's max connections
      .write.mode("append")
      .option("numPartitions", numPartitions.toString)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props())
  }

  /** DDL for the group dimension + its staging twin (schema_star.sql:35-41
    * shapes; the staging table has no PK — it is truncate-and-reload). */
  def ensureDimGrupoTables(url: String, table: String = "DIM_GRUPO",
                           staging: String = "STG_DIM_GRUPO"): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      def createIfMissing(name: String, pk: String): Unit = {
        val meta = conn.getMetaData.getTables(null, null, name, null)
        val exists = try meta.next() finally meta.close()
        if (!exists) {
          val st = conn.createStatement()
          try st.executeUpdate(
            s"""CREATE TABLE $name (
               |  grupo_codigo VARCHAR(50) NOT NULL$pk,
               |  grupo_nome VARCHAR(100),
               |  grupo_normalizado VARCHAR(100),
               |  ativo BOOLEAN
               |)""".stripMargin)
          finally st.close()
        }
      }
      createIfMissing(table, " PRIMARY KEY")
      createIfMissing(staging, "")
    } finally conn.close()
  }

  /** S8's REAL boundary — the reference's ON CONFLICT (codigo) DO UPDATE
    * (/root/reference/etl/etl_ida.py:555-620) as the production JDBC
    * pattern SCALE.md documents: truncate-and-reload a staging table
    * through the partitioned writer, then ONE server-side MERGE from
    * staging into the keyed dimension (set-based, atomic, index-driven —
    * never row-at-a-time driver upserts). Derby has had standard MERGE
    * since 10.11; the identical statement drives PostgreSQL 15+. */
  def upsertDimGrupo(batch: DataFrame, url: String,
                     table: String = "DIM_GRUPO",
                     staging: String = "STG_DIM_GRUPO",
                     numPartitions: Int = 5, batchSize: Int = 1000): Unit = {
    batch
      .repartition(numPartitions)
      .write.mode("overwrite")
      .option("truncate", "true") // keep the explicit VARCHAR schema
      .option("numPartitions", numPartitions.toString)
      .option("batchsize", batchSize.toString)
      .jdbc(url, staging, props())
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""MERGE INTO $table t USING $staging s
           |  ON t.grupo_codigo = s.grupo_codigo
           |WHEN MATCHED THEN UPDATE SET
           |  grupo_nome = s.grupo_nome,
           |  grupo_normalizado = s.grupo_normalizado,
           |  ativo = s.ativo
           |WHEN NOT MATCHED THEN INSERT
           |  (grupo_codigo, grupo_nome, grupo_normalizado, ativo)
           |  VALUES (s.grupo_codigo, s.grupo_nome, s.grupo_normalizado,
           |          s.ativo)""".stripMargin)
      finally st.close()
    } finally conn.close()
  }

  /** Read the loaded fact back through the JDBC source. */
  def readTable(spark: SparkSession, url: String,
                table: String = "FACT_IDA"): DataFrame =
    spark.read.jdbc(url, table, props())

  /** Cleanly shut down an embedded Derby database so its directory can be
    * wiped/re-created (Derby holds the store open for the JVM's lifetime
    * otherwise; a successful shutdown SIGNALS via SQLException 08006). */
  /** Empty tables in place — the per-iteration reset: TRUNCATE removes
    * every row but keeps the table, its PRIMARY KEY and the booted
    * database, so a replayed load starts from exactly the fresh-database
    * state without paying a whole Derby database re-creation (boot +
    * directory wipe + DDL) per bench iteration. The idempotency proof is
    * unchanged: the gate's content is the table after its loads, and a
    * truncated table is indistinguishable from a new one to the loader. */
  def truncateTables(url: String, tables: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try tables.foreach { t =>
      val st = conn.createStatement()
      try st.executeUpdate(s"TRUNCATE TABLE $t") finally st.close()
    } finally conn.close()
  }

  def shutdownDerby(dbPath: String): Unit =
    try {
      DriverManager.getConnection(s"jdbc:derby:$dbPath;shutdown=true")
      ()
    } catch {
      // 08006 = successful single-database shutdown; XJ004 = database
      // does not exist (nothing to shut down — first run)
      case e: java.sql.SQLException
          if e.getSQLState == "08006" || e.getSQLState == "XJ004" => ()
    }
}
