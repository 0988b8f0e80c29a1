package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — point-in-interval matching without a theta join
  * (SURVEY §2.3 lists range joins among the general joins the reference
  * lacks; Spark's built-in planner turns a bare inequality join into
  * BroadcastNestedLoopJoin, O(n·m) comparisons).
  *
  * Trick: quantize time into fixed-width bands. An interval [s, e) is
  * exploded to every band it overlaps; a point belongs to exactly one
  * band. The join becomes an EQUI join on the band id (hash join, one
  * shuffle) followed by the exact residual predicate. Work is
  * O(points + intervals·bands-per-interval + true-matches) — the same
  * technique as interval indexes in genomics/temporal databases.
  *
  * `bandWidth` should be on the order of the typical interval length:
  * too small explodes intervals into many bands, too large puts many
  * points per band back into the residual comparison.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [startCol, endCol)
    * contains pointCol (all three numeric/epoch-like, same unit).
    * Inner join; both inputs pass through unchanged (caller projects).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bandWidth: Long): DataFrame = {
    val p = points.withColumn("__band", floor(col(pointCol) / bandWidth).cast("long"))
    // Guard end > start: Spark's sequence() DESCENDS when stop < start,
    // so an empty [s,s) or a corrupt inverted interval would explode
    // phantom bands (or, for end << start, try to build a giant array
    // and kill the job) instead of matching nothing.
    // Last band = floor(end / bw), NOT floor((end-1) / bw): the `-1`
    // formulation assumes integer-granularity values and silently drops
    // true matches for fractional inputs (interval [5.0, 10.5) with
    // bw=10 must cover band 1, where point 10.2 lives). The end-exclusive
    // bound can over-include one band per interval; the exact residual
    // filter below removes those candidates — correctness never depends
    // on the band math, only candidate count does.
    val i = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bands",
        sequence(floor(col(startCol) / bandWidth).cast("long"),
          floor(col(endCol) / bandWidth).cast("long")))
      .withColumn("__band", explode(col("__bands"))).drop("__bands")
    p.join(i, Seq("__band"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__band")
  }
}
