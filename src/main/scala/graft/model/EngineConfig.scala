package graft.model

/** Engine configuration from environment variables — the reference's
  * `ETLConfig` dataclass (/root/reference/etl/etl_ida.py:64-89,
  * .env.example) minus the JDBC credentials (the engine's store is a
  * parquet path, not a database connection). Unset variables fall back to
  * the reference's defaults; unparseable numbers fall back too (the
  * reference would crash — a config typo should not take down a 1000-node
  * job when a sane default exists). */
case class EngineConfig(batchSize: Int = 1000, maxRetries: Int = 3,
                        anosAlvo: Seq[Int] = Seq(2017, 2018, 2019),
                        servicosAlvo: Seq[String] = Seq("SMP", "STFC", "SCM"),
                        factPath: String = "/tmp/graft/fact")

object EngineConfig {
  def fromEnv(env: Map[String, String] = sys.env): EngineConfig = {
    def int(key: String, dflt: Int) =
      env.get(key).flatMap(_.trim.toIntOption).getOrElse(dflt)
    def csv(key: String) = env.get(key).map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq)
    EngineConfig(
      batchSize = int("GRAFT_BATCH_SIZE", 1000),
      maxRetries = int("GRAFT_MAX_RETRIES", 3),
      anosAlvo = csv("GRAFT_ANOS_ALVO")
        .map(_.flatMap(_.toIntOption)).filter(_.nonEmpty)
        .getOrElse(Seq(2017, 2018, 2019)),
      servicosAlvo = csv("GRAFT_SERVICOS_ALVO").filter(_.nonEmpty)
        .getOrElse(Seq("SMP", "STFC", "SCM")),
      factPath = env.getOrElse("GRAFT_FACT_PATH", "/tmp/graft/fact"))
  }
}
