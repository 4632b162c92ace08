package graft.model

import java.sql.Date

/** Typed core model (SURVEY §1.1) — case classes + Encoders for the
  * normalized record and resource metadata abstractions of the reference
  * (/root/reference/etl/etl_ida.py:92-131). Used where compile-time typing
  * pays (typed transforms, mapPartitions); DataFrame columns elsewhere. */

/** One normalized observation (the reference's DataRecord dataclass). */
case class DataRecord(ano_mes: Date, grupo_economico: String, servico: String,
                      variavel: String, valor: Double, arquivo_origem: String,
                      linha_origem: Long)

/** Source/resource metadata (the reference's RecursoIDA dataclass). */
case class Resource(id: String, titulo: String, url: String, formato: String,
                    ano: Int, servico: String)
