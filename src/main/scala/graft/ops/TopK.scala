package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** O1 with an explicit global position column, computed in two phases
    * so no task ever sees more than one range of the data (the naive
    * `row_number().over(Window.orderBy(...))` funnels the whole input
    * through a single partition — the classic 100 TB killer):
    *
    *   1. range-shuffle on the ordering (`repartitionByRange`, sampled
    *      bounds) + per-partition sort — a distributed total sort;
    *   2. `zipWithIndex`, which runs one lightweight count-per-partition
    *      job and then streams each partition adding `cumulative offset +
    *      local index` — the "broadcast partition counts as offsets"
    *      construction, already provided by Spark at the RDD layer.
    *
    * The ordering must be total (include a unique tiebreak) for the
    * positions to be reproducible — same contract as the window version.
    * Cost: the input lineage is evaluated twice (count job + data job);
    * callers should project to the needed columns *before* this transform
    * since the RDD boundary blocks column pruning above it. */
  def withPosition(ordering: Seq[Column], posCol: String)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df.repartitionByRange(parts, ordering: _*)
      .sortWithinPartitions(ordering: _*)
    val schema = StructType(ranged.schema.fields :+
      StructField(posCol, LongType, nullable = false))
    val rows = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
