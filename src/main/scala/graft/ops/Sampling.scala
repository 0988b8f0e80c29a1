package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based sampling (`df.sample`) is replay-hostile at scale: results
  * depend on partition layout and task retries. Hash-prefix sampling
  * decides per ROW from stable content (the id), so the same row lands in
  * the same split on every run, on any cluster, at any partitioning —
  * the property curriculum/mixture pipelines need when they re-derive a
  * sample across snapshots. No shuffle: the decision is a scan-level
  * filter that pushes down beside the other predicates.
  */
object Sampling {

  /** Hex threshold for a [0,1] rate at 2-hex-digit (1/256) granularity. */
  private[ops] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0,1]")
    f"${math.round(rate * 256).min(256)}%02x"
  }

  /** The sampling key: first two hex chars of md5 of the id rendered as a
    * string — portable across engines (DuckDB computes the identical
    * digest, unlike xxhash64), uniform, and independent of row order. */
  def hashBucket(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2)

  /** Keep a row iff its hash bucket falls under its stratum's threshold.
    * `rates` maps stratum values to sampling rates (granularity 1/256);
    * unlisted strata use `defaultRate`. Deterministic, idempotent, and
    * exactly reproducible by any engine that can compute md5. */
  def stratifiedByHash(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val thresh = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < thresh)
  }
}
