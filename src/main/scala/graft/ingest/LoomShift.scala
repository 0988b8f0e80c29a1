package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed view of the core loom-shift fact columns (SURVEY §1.4): a
  * `Dataset[LoomShift]` for the code paths where compile-time field
  * checks matter (merge keys, predicate thresholds); the full 71-column
  * frame stays a DataFrame.
  *
  * Mirrors the reference's identity + production metrics
  * (reference src/main_01.py:337-356 cols 0-14).
  */
case class LoomShift(
    DataTurno: String,
    Tear: String,
    Artigo: String,
    Rpm: Double,
    Eficiencia: Double,
    Funcionando: Double,
    Parado: Double,
    Pontos: Double,
    Metros: Double,
    shift_date: java.sql.Date,
    shift: String)

object LoomShift {
  /** Project a normalized+typed frame (see [[LoomCsv.typedView]]) down to
    * the typed core. Metric NULLs (unparseable text survives typedView as
    * null via try_cast) are coerced to 0.0 — the primitive Double fields
    * of the case class would otherwise throw the non-nullable-field
    * encoder error on the first dirty row; 0.0 matches the engine's
    * lenient `numOrZero` semantics. */
  def fromTyped(df: DataFrame): Dataset[LoomShift] = {
    import df.sparkSession.implicits._
    def z(c: String) = coalesce(col(c), lit(0.0)).as(c)
    df.select(col("DataTurno"), col("Tear"), col("Artigo"), z("Rpm"),
        z("Eficiencia"), z("Funcionando"), z("Parado"), z("Pontos"),
        z("Metros"), col("shift_date"), col("shift"))
      .as[LoomShift]
  }
}
