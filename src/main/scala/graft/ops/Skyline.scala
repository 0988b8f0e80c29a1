package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 2-D Pareto frontier (skyline): the rows not dominated on
  * (minimize `minCol`, maximize `maxCol`). Row p dominates row q when
  * p.min ≤ q.min and p.max ≥ q.max with at least one strict; rows tied
  * on BOTH axes dominate neither and survive together. The north-star
  * use is corpus curation trade-offs — e.g. "shortest documents for a
  * given vocabulary diversity" — where the frontier IS the answer set
  * and everything else is provably a worse trade.
  *
  * The textbook formulation is the O(n²) dominance self-join (that is
  * the DuckDB oracle). The distributed form here touches each row a
  * constant number of times around ONE data Exchange:
  *
  *  1. value-range-bucket rows on the minimize axis (global min/max
  *     from a tiny broadcast aggregate — no sort, no sampling pass);
  *  2. inside each bucket, two windows resolve all in-bucket
  *     dominance: a strict-less range frame (max of the maximize axis
  *     over strictly smaller minimize values) and an equal-key
  *     partition max (a strictly better twin at the same minimize
  *     value);
  *  3. cross-bucket dominance collapses to a bucket-grain aggregate:
  *     every row of an earlier bucket has a strictly smaller minimize
  *     value than every row of a later bucket, so "dominated from
  *     outside the bucket" is exactly "some earlier bucket's max ≥ my
  *     maximize value" — a running prefix max over ≤ nBuckets rows,
  *     broadcast back.
  *
  * No pair join at any scale; the only full-data shuffle is the bucket
  * Exchange the windows need. Skew on the minimize axis concentrates a
  * bucket, bounded by bucket width — raise `nBuckets` to tighten.
  * Inputs must be non-null integral columns.
  */
object Skyline {

  def frontier2d(df: DataFrame, minCol: String, maxCol: String,
                 nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val y = col(maxCol)
    val bounds = df.agg(min(col(minCol)).cast("long").as("__lo"),
      max(col(minCol)).cast("long").as("__hi"))
    // staged: the prefix-max branch below re-reads this projection —
    // without the pin it would RECOMPUTE the caller's projection
    // (often the expensive part, e.g. q153's tokenize) from a second
    // source scan. Callers should pass a pruned df: the cache holds
    // exactly its columns plus the bucket id.
    val bucketed = Staged.stage(df.crossJoin(broadcast(bounds))
      .withColumn("__b", expr(
        s"CAST((CAST(`$minCol` AS BIGINT) - __lo) * $nBuckets" +
          " DIV (__hi - __lo + 1) AS INT)"))
      .drop("__lo", "__hi"))
    val wLess = Window.partitionBy("__b").orderBy(col(minCol).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("__b"), col(minCol))
    // ≤ nBuckets rows: the unpartitioned running-max window is a
    // constant-size frame over the bucket summary, not a data window
    val prefix = bucketed.groupBy("__b").agg(max(y).as("__bm"))
      .withColumn("__mPrev", max(col("__bm")).over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)))
      .select("__b", "__mPrev")
    bucketed
      .withColumn("__mLess", max(y).over(wLess))
      .withColumn("__mEq", max(y).over(wEq))
      .join(broadcast(prefix), "__b")
      .where((col("__mLess").isNull || col("__mLess") < y) &&
        col("__mEq") === y &&
        (col("__mPrev").isNull || col("__mPrev") < y))
      .drop("__b", "__mLess", "__mEq", "__mPrev")
  }

  /** [[frontier2d]] independently within each `groupCols` key — the
    * per-domain/per-source curation frontier. Same structure, with the
    * group key prepended everywhere: per-group bounds join (the bounds
    * table is |groups| rows), per-(group, bucket) windows off one
    * Exchange, and a |groups|·nBuckets-row prefix table whose running
    * max windows PER GROUP before broadcasting back. The fact table
    * still shuffles once, on (group, bucket). */
  def frontier2dPerGroup(df: DataFrame, groupCols: Seq[String],
                         minCol: String, maxCol: String,
                         nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(groupCols.nonEmpty, "use frontier2d for the ungrouped form")
    val g = groupCols.map(col)
    val y = col(maxCol)
    val bounds = df.groupBy(g: _*)
      .agg(min(col(minCol)).cast("long").as("__lo"),
        max(col(minCol)).cast("long").as("__hi"))
    val bucketed = Staged.stage(df.join(broadcast(bounds), groupCols)
      .withColumn("__b", expr(
        s"CAST((CAST(`$minCol` AS BIGINT) - __lo) * $nBuckets" +
          " DIV (__hi - __lo + 1) AS INT)"))
      .drop("__lo", "__hi"))
    val gb = (groupCols :+ "__b").map(col)
    val wLess = Window.partitionBy(gb: _*).orderBy(col(minCol).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy((gb :+ col(minCol)): _*)
    val prefix = bucketed.groupBy(gb: _*).agg(max(y).as("__bm"))
      .withColumn("__mPrev", max(col("__bm")).over(
        Window.partitionBy(g: _*).orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select((groupCols :+ "__b" :+ "__mPrev").map(col): _*)
    bucketed
      .withColumn("__mLess", max(y).over(wLess))
      .withColumn("__mEq", max(y).over(wEq))
      .join(broadcast(prefix), groupCols :+ "__b")
      .where((col("__mLess").isNull || col("__mLess") < y) &&
        col("__mEq") === y &&
        (col("__mPrev").isNull || col("__mPrev") < y))
      .drop("__b", "__mLess", "__mEq", "__mPrev")
  }
}
