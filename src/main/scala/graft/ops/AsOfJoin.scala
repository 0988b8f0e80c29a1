package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic event-enrichment operator the
  * reference lacks and Spark has no built-in for (SURVEY §2.3 "absent"
  * row). For each left row, attach the most recent right row with the
  * same key and `rightTs <= leftTs`.
  *
  * Implementation: union-and-carry-forward rather than a per-row range
  * probe — tag both sides, union, and run one window per key ordered by
  * (ts, side) carrying the last non-null right payload forward
  * (`last(..., ignoreNulls = true)`). Right rows at the same timestamp
  * as a left row sort first, so ties match (ASOF semantics).
  *
  * Scale: ONE shuffle on the key (same as any join on that key), no
  * range-explosion, no driver involvement; the window scan is linear per
  * key partition. This beats a theta/range join (O(n·m) pairs) and is the
  * standard formulation for distributed as-of joins. Skewed keys: salt
  * the key and union per-salt results, or bound the window with a
  * time-bucket pre-join — deferred until data demands it.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (must contain `keyCols`, `tsCol`,
    *                   and `payloadCols`)
    * @param keyCols    equi-join key
    * @param tsCol      event-time column, same name both sides
    * @param payloadCols right columns carried to the matched left row
    *                   (emitted with a `matched_` prefix, plus
    *                   `matched_ts` for the matched timestamp)
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__m_ts", lit(null).cast(right.schema(tsCol).dataType))
      .select(Seq(col("__side"), col("__m_ts")) ++ keyCols.map(col) ++ Seq(col(tsCol)) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .withColumn("__m_ts", col(tsCol))
      .select(Seq(col("__side"), col("__m_ts")) ++ keyCols.map(col) ++ Seq(col(tsCol)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .select(
        (Seq(col("__side"), col(tsCol)) ++ keyCols.map(col) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col) ++
          payloadCols.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w)
            .as(s"matched_$c")) :+
          last(col("__m_ts"), ignoreNulls = true).over(w).as("matched_ts")): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }
}
