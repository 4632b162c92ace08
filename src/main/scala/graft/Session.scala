package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so Verify / Bench / tests share the exact
  * same semantics-critical configuration.
  *
  * - `spark.sql.ansi.enabled=false`: the engine follows the reference's
  *   null-on-failure coercion semantics (/root/reference/etl/etl_ida.py:422-429
  *   parse errors -> None), not ANSI error semantics.
  * - `spark.sql.legacy.parquet.nanosAsLong=true`: the `events` fixture stores
  *   TIMESTAMP(NANOS) which Spark otherwise refuses to read; the reader in
  *   [[graft.sources.Tables]] converts the long back to a microsecond
  *   timestamp with integer arithmetic (no double round-trip).
  * - UTC session timezone: required for DuckDB-oracle parity.
  * - Shuffle partitions sized to the local core count, not the 200 default:
  *   on a real cluster this would instead be tuned to ~2-3x total cores /
  *   left to AQE coalescing, which is enabled.
  */
object Session {
  def build(master: String = s"local[${defaultCpus}]",
            shufflePartitions: Option[Int] = None,
            appName: String = "graft",
            extraConf: Map[String, String] = Map.empty): SparkSession = {
    val parts = shufflePartitions.getOrElse(defaultCpus)
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    extraConf.foldLeft(b) { case (acc, (k, v)) => acc.config(k, v) }
      .getOrCreate()
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(c => scala.util.Try(c.toInt).toOption)
      .getOrElse(math.max(2, Runtime.getRuntime.availableProcessors()))
}
