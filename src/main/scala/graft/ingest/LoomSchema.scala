package graft.ingest

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's 71-column positional `daily` schema
  * (reference src/main_01.py:337-356): ordinal → column name, every cell
  * a string (types are "stringly kept, numerically coerced on demand",
  * src/main_01.py:358-364). The engine ingests as all-string and applies
  * an explicit typed projection stage ([[LoomCsv.typedView]]) — preserving
  * reference semantics including `float('' or 0) → 0.0`.
  */
object LoomSchema {

  /** Ordinals 0–70, exactly the reference's column_mapping. */
  val columnNames: Seq[String] = {
    val identity = Seq("DataTurno", "Tear")
    val article  = Seq("Artigo", "Filler", "ArtigoGen")
    val production = Seq("Rpm", "Eficiencia", "Funcionando", "Parado",
      "Pontos", "Metros", "Jardas", "MedidaGen", "QtdGen", "MinGen")
    // 10 named stop-reason (count, minutes) pairs — cols 15-34.
    val stopReasons = Seq("ParadasUrdume", "ParadasOurelaFalsa",
      "ParadasLenoDireita", "ParadasLenoEsquerda", "ParadasTrama",
      "TrocaDeRolo", "CorteTecido", "ParadaManual", "EnergiaDesligada",
      "ParadasOutras").flatMap(r => Seq(s"Qtd$r", s"Min$r"))
    // 4 weft-feeler counters — cols 35-38.
    val weftFeelers = Seq("Wf11", "Wf12", "Wf21", "Wf22")
    // 16 generic stop pairs — cols 39-70.
    val generic = (1 to 16).flatMap(i => Seq(s"QtdGen$i", s"MinGen$i"))
    identity ++ article ++ production ++ stopReasons ++ weftFeelers ++ generic
  }
  require(columnNames.size == 71)

  /** All-string StructType for the raw CSV read (header-less, positional). */
  val raw: StructType =
    StructType(columnNames.map(StructField(_, StringType, nullable = true)))

  /** The numeric metric columns (everything except the string identity /
    * article fields) — candidates for the cast-coalesce typed view. */
  val metricColumns: Seq[String] =
    columnNames.drop(5)

  /** Composite primary key (reference src/main_01.py:235-253). */
  val primaryKey: Seq[String] = Seq("DataTurno", "Tear")
}
