package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / top-k operators (SURVEY §2.6, O1–O4).
  *
  * Reference shapes: newest-first file sort (src/main_01.py:329-331),
  * head-2 most-recent months (src/main_02.py:226-232), display truncation,
  * and a keep-last-N log ring buffer (src/main_01.py:955-957).
  */
object TopK {

  /** O2/O4 — top-k rows per group by an explicit total ordering.
    * `row_number` (not `rank`) + a unique tiebreak in `ordering` gives a
    * deterministic result set. Scale: single hash shuffle on the group
    * keys; per-partition sort is bounded by group size (no global sort).
    */
  def perGroup(groupCols: Seq[String], ordering: Seq[Column], k: Int)
              (df: DataFrame): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** O1/O3 — global top-k with total ordering. Catalyst plans
    * `orderBy().limit(k)` as TakeOrderedAndProject: each partition keeps
    * only k rows, so no full global sort is materialized. */
  def global(ordering: Seq[Column], k: Int)(df: DataFrame): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** O1 with an explicit global position column. The empty
    * `Window.orderBy` serializes through one partition — fine for
    * bounded/aggregated inputs (the only place the engine uses it); for
    * raw 100 TB inputs prefer [[global]] or zipWithIndex-free rank-by-key.
    */
  def withPosition(ordering: Seq[Column], posCol: String)(df: DataFrame): DataFrame =
    df.withColumn(posCol, row_number().over(Window.orderBy(ordering: _*)))
}
