package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scraped-dimension ingestion (SURVEY §2.1 S6–S8). The HTTP/HTML fetch
  * itself is an ingest boundary outside the engine (the reference drives
  * a Perl CGI with requests + regex, src/main_01.py:48-72,
  * src/main_02.py:144-192); the engine consumes the boundary's tabular
  * output — raw option lines — and owns the parsing, filtering and
  * dimension-table construction as Spark plans.
  */
object Dims {

  /** S6 — loom dimension from `<option value="ID">ID NAME</option>`-shaped
    * lines: extract (tear_id, tear_name) pairs
    * (reference src/main_01.py:48-72: split on whitespace, id = first
    * token, name = rest). */
  def loomDim(raw: DataFrame, lineCol: String = "line"): DataFrame = {
    val toks = split(trim(col(lineCol)), "\\s+")
    raw.select(
        toks.getItem(0).as("tear_id"),
        array_join(slice(toks, 2, 1000), " ").as("tear_name"))
      .filter(col("tear_id").rlike("^\\d+$"))
  }

  /** S7 — available-months dimension: three typed month lists from the
    * export form's selects (reference src/main_02.py:144-192). Input:
    * (month_type, month) rows; the engine validates the `YYYY.MM` format
    * (P6, reference src/tms_exporter.py:46-49) and dedups (U2). */
  def monthDim(raw: DataFrame): DataFrame =
    raw.filter(col("month").rlike("^\\d{4}\\.\\d{2}$"))
      .select("month_type", "month").distinct()

  /** O2 over S7 — the head-2 most recent months per type that drive the
    * pruned export (reference src/main_02.py:226-232). `YYYY.MM` strings
    * sort chronologically, so max-2-per-group is a string ordering. */
  def lastTwoMonthsPerType(months: DataFrame): DataFrame =
    graft.ops.TopK.perGroup(Seq("month_type"),
      Seq(col("month").desc), 2)(months)

  /** S8 — status-pattern scan of collector monitor lines
    * (reference src/tms_colector.py:252-286): keep progress/status rows. */
  def statusLines(raw: DataFrame, lineCol: String = "line"): DataFrame =
    raw.filter(col(lineCol).contains("--->") ||
      col(lineCol).contains("Sucesso") || col(lineCol).contains("Incorreto"))

  /** Convenience: build a dimension frame from boundary output delivered
    * as plain text files. */
  def fromTextFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "line")
}
