package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join — the classic event-enrichment operator the
  * reference lacks and Spark has no built-in for (SURVEY §2.3 "absent"
  * row). For each left row, attach the most recent right row with the
  * same key and `rightTs <= leftTs`.
  *
  * Implementation: union-and-carry-forward rather than a per-row range
  * probe — tag both sides, union, and run one window per key ordered by
  * (ts, side) carrying the last right row forward. The matched right row
  * travels as a SINGLE struct through `last(..., ignoreNulls = true)`:
  * the struct is null only for left rows, so a right row whose payload
  * fields are legitimately NULL still matches as itself — field-by-field
  * carrying would stitch values from different right rows. Right rows at
  * the same timestamp as a left row sort first, so ties match (ASOF
  * semantics, same as DuckDB's ASOF JOIN).
  *
  * Scale: ONE shuffle on the key (same as any join on that key), no
  * range-explosion, no driver involvement; the window scan is linear per
  * key partition. This beats a theta/range join (O(n·m) pairs) and is the
  * standard formulation for distributed as-of joins. Skewed keys: opt
  * into `timeBucket` — the window then partitions on (key, bucket) so a
  * hot key's rows spread across its time buckets, and matches that cross
  * a bucket boundary are recovered by carrying each bucket's last right
  * payload forward through a per-key window over BUCKETS (one row per
  * bucket — cluster-small even for the hottest key).
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side (must contain `keyCols`, `tsCol`,
    *                    and `payloadCols`)
    * @param keyCols     equi-join key
    * @param tsCol       event-time column, same name both sides
    * @param payloadCols right columns carried to the matched left row
    *                    (emitted with a `matched_` prefix, plus
    *                    `matched_ts` for the matched timestamp)
    * @param timeBucket  opt-in hot-key mitigation: a MONOTONE
    *                    NON-DECREASING function of the timestamp column
    *                    (e.g. `ts => date_trunc("hour", ts)`) used to
    *                    sub-partition each key's window. Monotonicity is
    *                    what makes "carry across bucket heads" correct —
    *                    every right row in an earlier bucket precedes
    *                    every row of a later one. Output-identical to
    *                    the default path (proven by AsOfJoinSpec's
    *                    equivalence test on a skewed fixture).
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String],
           timeBucket: Option[Column => Column] = None): DataFrame = {
    val leftOther = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    val payType = StructType(
      payloadCols.map(c => StructField(c, right.schema(c).dataType)) :+
        StructField("__m_ts", right.schema(tsCol).dataType))

    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(col(tsCol)) ++ leftOther.map(col) ++ Seq(
        lit(1).as("__side"),
        lit(null).cast(payType).as("__pay")): _*)
    // a NULL-timestamp right row must never match (ASOF `l.ts >= r.ts`
    // is never true for null r.ts) — but nulls sort FIRST in the window,
    // so an unfiltered one would be carried into every left row of its
    // key as a phantom match
    val taggedRight = right.filter(col(tsCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        lit(0).as("__side"),
        struct(payloadCols.map(col) :+ col(tsCol).as("__m_ts"): _*).as("__pay")): _*)

    val unioned = taggedLeft.unionByName(taggedRight)
    val carried = timeBucket match {
      case None =>
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(tsCol), col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      case Some(bucketOf) =>
        // hot-key path: carry within (key, bucket), stitched across
        // buckets by INJECTING each bucket's carry-in payload as a
        // synthetic bucket-opening row rather than joining it back —
        // the union is bucket-count-sized and the big frame is shuffled
        // exactly once, on (key, bucket). (A join-back formulation
        // measured 6× slower at 10M rows: the null-safe join condition
        // defeats partitioning reuse and re-Exchanges the whole frame.)
        // The cross-bucket state is ONE row per (key, bucket) — each
        // bucket's last right payload, max_by over right rows only — so
        // the per-key carry window ranks buckets, not rows, and the
        // hottest key costs O(#buckets) in one task, not O(#rows).
        val bucketed = unioned.withColumn("__b", bucketOf(col(tsCol)))
        // every (key, bucket) gets a row (left-only buckets too — their
        // null __blast is skipped by the ignoreNulls carry). __bmin is
        // the synthetic row's timestamp: ≤ every real row in its
        // bucket, and __side = -1 orders it before real rows at that
        // exact timestamp.
        val heads = bucketed.groupBy((keyCols :+ "__b").map(col): _*)
          .agg(min(col(tsCol)).as("__bmin"),
            max_by(col("__pay"),
              when(col("__side") === 0, col(tsCol))).as("__blast"))
        val wC = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // window partitioning groups NULL keys like groupBy does, so
        // synthetic rows reach null-key groups exactly like the default
        // path's carry; the null BUCKET (null-ts left rows) sorts first
        // in wC, has nothing preceding, and is dropped by the isNotNull
        // filter — "a null ts never matches" holds on this path too.
        val carryRows = heads
          .withColumn("__pay", last(col("__blast"), ignoreNulls = true).over(wC))
          .filter(col("__pay").isNotNull)
          .select(keyCols.map(col) ++ Seq(col("__bmin").as(tsCol)) ++
            leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
            lit(-1).as("__side"), col("__pay"), col("__b")): _*)
        val wB = Window.partitionBy((keyCols :+ "__b").map(col): _*)
          .orderBy(col(tsCol), col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.unionByName(carryRows)
          .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(wB))
    }
    carried.filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col(tsCol)) ++ leftOther.map(col) ++
          payloadCols.map(c => col("__m").getField(c).as(s"matched_$c")) :+
          col("__m").getField("__m_ts").as("matched_ts"): _*)
  }
}
