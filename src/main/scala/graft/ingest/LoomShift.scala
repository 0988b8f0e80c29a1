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
    * the typed core. */
  def fromTyped(df: DataFrame): Dataset[LoomShift] = {
    import df.sparkSession.implicits._
    df.select(col("DataTurno"), col("Tear"), col("Artigo"), col("Rpm"),
        col("Eficiencia"), col("Funcionando"), col("Parado"), col("Pontos"),
        col("Metros"), col("shift_date"), col("shift"))
      .as[LoomShift]
  }
}
