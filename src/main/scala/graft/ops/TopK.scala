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

  /** O1 with an explicit global position column, computed in two phases
    * so no task ever sees more than one range of the data (the naive
    * `row_number().over(Window.orderBy(...))` funnels the whole input
    * through a single partition — the classic 100 TB killer):
    *
    *   1. range-shuffle on the ordering (`repartitionByRange`, sampled
    *      bounds) pins each row to a partition id `p` such that all rows
    *      in partition p sort before all rows in p+1;
    *   2. per-partition counts → cumulative offsets (a P×P self-join
    *      where P = shuffle partitions — cluster-sized, not data-sized,
    *      and free of single-partition windows), broadcast back;
    *   3. position = offset(p) + row_number within p.
    *
    * Everything is a lazy declarative plan — no RDD boundary (which
    * would block column pruning) and no eager job at construction time
    * (`rdd.zipWithIndex` runs its count job inside the RDD constructor,
    * i.e. merely *building* the frame would execute the shuffle).
    * The ordering must be total (include a unique tiebreak) for the
    * positions to be reproducible — same contract as the window version.
    *
    * The ranged frame is PERSISTED because two plan branches (counts +
    * data) consume it and `RangePartitioner` samples its bounds with an
    * rddId-derived seed: two independent executions of the exchange can
    * disagree on partition boundaries, silently corrupting the offsets
    * (observed: duplicate/shifted positions). The cache pins one
    * materialized partitioning for both branches — the same staged-
    * intermediate pattern as the dedup shingle table; MEMORY_AND_DISK
    * keeps it spill-safe at scale. It is registered with [[Staged]] so
    * the per-query releaseAll unpins it once the query's action ran. */
  def withPosition(ordering: Seq[Column], posCol: String)(df: DataFrame): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val ranged = Staged.stage(df.repartitionByRange(parts, ordering: _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    val w = Window.partitionBy("__pid").orderBy(ordering: _*)
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(posCol, col("__off") + row_number().over(w))
      .drop("__pid", "__off")
  }
}
