package graft.sources

import graft.model.{EngineConfig, Resource}

/** S1-S3 analog: resource discovery + filtering. The reference walks a CKAN
  * REST catalog, filters resources by target year / service / format, and
  * downloads each hit (/root/reference/etl/etl_ida.py:653-730). In this
  * sandboxed engine the catalog is a directory listing (SURVEY §7.1's
  * by-design file substitution); the FILTERING — the actual query logic —
  * is faithful: keep resources whose format matches and whose name carries
  * a target year and target service.
  *
  * Driver-side by design: a catalog is metadata (thousands of entries, not
  * terabytes); the data those entries point at is what Spark scans.
  */
object Catalog {

  private val namePattern = "(?i)ida[_-]raw[_-](\\d{4})[_-]([a-z]+)\\.(\\w+)".r

  /** Scan a directory into resource metadata, one entry per recognized
    * file: `ida_raw_<year>_<service>.<ext>`. Unrecognized files are ignored
    * (the reference skips non-ODS resources the same way). */
  def listResources(dir: String): Seq[Resource] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
    files.sortBy(_.getName).flatMap { f =>
      f.getName match {
        case namePattern(year, service, ext) =>
          Some(Resource(
            id = f.getName,
            titulo = s"IDA ${service.toUpperCase} $year",
            url = f.getAbsolutePath,
            formato = ext.toUpperCase,
            ano = year.toInt,
            servico = service.toUpperCase))
        case _ => None
      }
    }
  }

  /** S2: the reference's resource filter — format + target years + target
    * services (etl_ida.py:694-713). `WB` is the workbook-container format
    * (see [[resolveSheet]]). */
  def filterResources(resources: Seq[Resource], cfg: EngineConfig,
                      formats: Set[String] = Set("CSV", "ODS", "WB")): Seq[Resource] =
    resources.filter(r =>
      formats.contains(r.formato) &&
        cfg.anosAlvo.contains(r.ano) &&
        cfg.servicosAlvo.contains(r.servico))

  /** Discover-and-filter in one call: the reference's discovery loop. */
  def discover(dir: String, cfg: EngineConfig): Seq[Resource] =
    filterResources(listResources(dir), cfg)

  /** The reference's service -> sheet-name map
    * (/root/reference/etl/etl_ida.py:171-176): each workbook carries one
    * named sheet per service, and the extractor reads ONLY the sheet its
    * resource's service maps to — the other sheets in the container are
    * never parsed. */
  val sheetMapping: Map[String, String] = Map(
    "SMP"  -> "Móvel_Pessoal",
    "SCM"  -> "Banda_Larga_Fixa",
    "STFC" -> "Telefonia_Fixa")

  /** The service's mapped sheet name, failing loudly for an unmapped
    * service like the reference's "Serviço X não tem mapeamento de sheet"
    * (etl_ida.py:209-212). */
  def mappedSheet(service: String): String =
    sheetMapping.getOrElse(service, throw new IllegalArgumentException(
      s"service $service has no sheet mapping"))

  /** Resolve where a resource's delimited data actually lives: a plain
    * file is itself; a `WB` workbook container (a directory of named
    * sheets — the directory analog of an ODS zip container) resolves to
    * its service's mapped sheet. `ODS` resources are whole containers —
    * they are read by [[Ods.readIdaExport]] with [[mappedSheet]], not
    * through a path (the sheet lives inside the zip). */
  def resolveSheet(r: Resource): String = r.formato match {
    case "WB" =>
      new java.io.File(r.url, s"${mappedSheet(r.servico)}.csv").getPath
    case _ => r.url
  }
}
