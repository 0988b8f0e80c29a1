package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingestion with the reference's exact input semantics
  * (SURVEY §2.1 S1–S5):
  *
  *  - S1: header-less positional read against the 71-col schema.
  *  - S2: encoding fallback utf-8 → latin-1 (reference
  *    src/main_01.py:372-387 tries utf-8 → latin-1 → cp1252; Spark never
  *    throws on malformed bytes, it substitutes U+FFFD — so the fallback
  *    trigger is "any replacement char decoded", and latin-1 maps every
  *    byte, terminating the chain like the reference's latin-1 arm).
  *  - S3: BOM strip (Spark's CSV reader handles a file-level BOM; a
  *    mid-file BOM'd line is scrubbed in the normalize projection).
  *  - S4: recursive case-insensitive `*.csv`/`*.CSV` discovery.
  *  - S5: month-directory pruning — only `YYYY-MM/<datasetType>/` paths
  *    (reference src/main_02.py:801-821) — done at path-construction time
  *    so Spark never lists excluded directories (true partition pruning,
  *    same trick as the reference's manual dir descent).
  */
object LoomCsv {

  private val csvGlob = "*.{csv,CSV}"

  /** S1+S3+S4 — raw recursive read of every CSV under `root`. */
  def readRaw(spark: SparkSession, root: String,
              charset: String = "UTF-8"): DataFrame =
    readPaths(spark, Seq(root), charset, recursive = true)

  private def readPaths(spark: SparkSession, paths: Seq[String],
                        charset: String, recursive: Boolean): DataFrame =
    spark.read
      .schema(LoomSchema.raw)
      .option("header", "false")
      .option("encoding", charset)
      .option("mode", "PERMISSIVE")
      .option("recursiveFileLookup", recursive.toString)
      .option("pathGlobFilter", csvGlob)
      .csv(paths: _*)

  /** S2 — encoding-fallback read, PER FILE like the reference
    * (src/main_01.py:372-387 retries each file independently): files
    * whose utf-8 decode produced replacement chars (U+FFFD) are re-read
    * as latin-1 (which decodes any byte sequence); clean utf-8 files are
    * left untouched — a dataset-global fallback would mojibake the
    * multi-byte utf-8 in every good file. The driver-side file list is
    * bounded by the number of *corrupt* files, not data size. */
  def readWithFallback(spark: SparkSession, root: String): DataFrame = {
    val utf8 = readRaw(spark, root, "UTF-8")
    val badFiles = utf8
      .filter(LoomSchema.columnNames.take(5).map(c => col(c).contains("�")).reduce(_ || _))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    if (badFiles.isEmpty) utf8
    else {
      val good = utf8.filter(!input_file_name().isin(badFiles.toSeq: _*))
      good.unionByName(readPaths(spark, badFiles.toSeq, "ISO-8859-1", recursive = false))
    }
  }

  /** S5 — partition-pruned read: only `root/YYYY-MM/<datasetType>/` dirs
    * for the requested months. Builds explicit per-month paths so the
    * file listing itself is pruned, then tags each row with its `month`
    * partition column (from the path) for downstream partition-style
    * filters. */
  def readMonths(spark: SparkSession, root: String, months: Seq[String],
                 datasetType: String = "daily"): DataFrame = {
    val monthRe = "^\\d{4}-\\d{2}$".r
    val valid = months.filter(m => monthRe.findFirstIn(m).isDefined)
    require(valid.nonEmpty, s"no valid YYYY-MM months in $months")
    val paths = valid.map(m => s"$root/$m/$datasetType")
    spark.read
      .schema(LoomSchema.raw)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("pathGlobFilter", csvGlob)
      .csv(paths: _*)
      .withColumn("month",
        regexp_extract(input_file_name(), "(\\d{4}-\\d{2})/[^/]+/[^/]+$", 1))
      .withColumn("dataset_type", lit(datasetType))
  }

  /** P1+P2 normalize: trim every cell, scrub stray BOMs, drop rows with
    * fewer than 3 populated leading cells (the reference's short-row skip,
    * src/main_01.py:403-405). */
  def normalize(df: DataFrame): DataFrame = {
    val trimmed = LoomSchema.columnNames.foldLeft(df) { (d, c) =>
      d.withColumn(c, trim(regexp_replace(col(c), "^\\uFEFF", "")))
    }
    trimmed.filter(
      LoomSchema.columnNames.take(3).map(c => col(c).isNotNull && col(c) =!= "")
        .reduce(_ && _))
  }

  /** Typed view: identity/article columns stay strings; every metric
    * column becomes double via the reference's `float(x or 0)` coercion.
    * Also derives `shift_date` (DateType) and `shift` (A/B/C) from the
    * `YYYY-MM-DD.S` composite key (SURVEY §1.1). */
  def typedView(df: DataFrame): DataFrame = {
    // the single source of the reference's float(x or 0) coercion —
    // an inline copy here once drifted from it (no trim before the
    // empty-check), so the two paths disagreed on whitespace-only cells
    val casted = LoomSchema.metricColumns.foldLeft(df) { (d, c) =>
      d.withColumn(c, graft.ops.Filters.pyFloatOrZero(c))
    }
    casted
      .withColumn("shift_date", to_date(substring_index(col("DataTurno"), ".", 1)))
      .withColumn("shift", substring_index(col("DataTurno"), ".", -1))
  }
}
