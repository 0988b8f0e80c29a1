package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate / filter operators (SURVEY §2.2, P3–P11).
  *
  * Each is a pure `DataFrame => DataFrame` transform so callers compose them
  * with `.transform(...)`. All predicates are plain Catalyst expressions —
  * they stay inside whole-stage codegen and push down to the parquet scan.
  */
object Filters {

  /** P3 — short-row / null-key filter.
    * Reference skips CSV rows with fewer than 3 cells
    * (reference src/main_01.py:403-405); on a schematized DataFrame the
    * equivalent is requiring the key columns to be non-null.
    */
  def nonNullKeys(keys: Seq[String])(df: DataFrame): DataFrame =
    df.filter(keys.map(k => col(k).isNotNull).reduce(_ && _))

  /** P4 — the "desligado" (powered-off) compound predicate.
    * Reference: `DataTurno.endswith('.C') AND float(Funcionando or 0)==0
    * AND float(Parado or 0) >= 400` (reference src/main_01.py:439-458).
    * The `float(x or 0)` coercion — empty/unparseable → 0.0 — maps to
    * `coalesce(cast(double), 0.0)`; unparseable strings cast to null in
    * Spark, which the coalesce absorbs, matching the reference's
    * swallow-exception-→-False behavior (src/main_01.py:457-458) for the
    * == 0 arm and diverging safely (documented) for the >= arm.
    */
  def poweredOff(shiftCol: String, runningCol: String, stoppedCol: String,
                 stoppedMin: Double): Column =
    // coalesce(false): unparseable input makes the comparison NULL; the
    // reference's swallowed exception means "definitely not powered off",
    // and a three-valued NULL here would poison negation (`!pred` in the
    // import gate must keep the row, not drop it from both branches).
    coalesce(
      col(shiftCol).endsWith(".C") &&
        pyFloatOrZero(runningCol) === 0.0 &&
        pyFloatOrZero(stoppedCol) >= stoppedMin,
      lit(false))

  /** `float(x or 0)` from reference src/main_01.py:447-449, with the
    * reference's exception behavior preserved: empty/null → 0.0 (the
    * `or 0` arm) but *unparseable* text → null, so any comparison on it
    * is false — matching the reference's swallowed ValueError making the
    * whole predicate False (src/main_01.py:457-458). A plain
    * `coalesce(cast, 0)` would wrongly treat 'abc' as 0. */
  def pyFloatOrZero(c: String): Column =
    when(col(c).isNull || trim(col(c)) === "", lit(0.0))
      .otherwise(col(c).try_cast("double")) // ANSI-safe: malformed → null

  /** Lenient numeric coercion: anything unparseable → 0.0. */
  def numOrZero(c: String): Column =
    coalesce(col(c).try_cast("double"), lit(0.0))

  /** P6 — regex format filter (reference src/tms_exporter.py:46-49:
    * keep month keys matching `\d{4}\.\d{2}`). */
  def matching(c: String, pattern: String)(df: DataFrame): DataFrame =
    df.filter(col(c).rlike(pattern))

  /** P10 — recency filter relative to the dataset's own max timestamp
    * (reference src/main_02.py:887-891 counts files touched in the last
    * 24 h). Computed with a broadcast single-row aggregate rather than a
    * driver-side collect so the plan stays fully distributed.
    */
  def withinOfMax(tsCol: String, interval: String)(df: DataFrame): DataFrame = {
    val mx = df.agg(max(col(tsCol)).as("__max_ts"))
    df.crossJoin(broadcast(mx))
      .filter(col(tsCol) > col("__max_ts") - expr(s"INTERVAL $interval"))
      .drop("__max_ts")
  }

  /** P11 — TTL/age filter (reference src/main_01.py:1386-1394: delete
    * files older than 30 days). Complement of [[withinOfMax]]. */
  def olderThanMax(tsCol: String, interval: String)(df: DataFrame): DataFrame = {
    val mx = df.agg(max(col(tsCol)).as("__max_ts"))
    df.crossJoin(broadcast(mx))
      .filter(col(tsCol) <= col("__max_ts") - expr(s"INTERVAL $interval"))
      .drop("__max_ts")
  }
}
