package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SCALE.md): two-phase salted aggregation for
  * hot-key groupBys. Phase 1 shuffles on (key, salt) — a hot key's rows
  * spread across `salts` reducers; phase 2 merges the per-salt partials
  * on the key alone (tiny input: #keys × salts rows).
  *
  * AQE's skew handling covers joins; aggregation skew on a pathological
  * key distribution (one loom/user = 10% of 100 TB) still serializes one
  * reducer without this. Only algebraic aggregates (count/sum/min/max
  * and anything mergeable) qualify — mean is derived from sum+count.
  */
object Skew {

  /** count + sum aggregation with salting.
    * @param keys   group-by keys
    * @param sumCol column to sum
    * @param salts  salt fan-out (≈ expected hot-key skew factor)
    */
  /** Deterministic row-content salt: a nondeterministic source (rand /
    * monotonically_increasing_id) would re-salt rows differently when a
    * map task is retried or speculated, double-counting or dropping rows
    * in the phase-1 partials. Hashing the row content keeps every replay
    * of a row in the same (key, salt) group; identical rows sharing a
    * salt is harmless — aggregation is over all rows either way. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts))

  def saltedCountSum(keys: Seq[String], sumCol: String, salts: Int)
                    (df: DataFrame): DataFrame = {
    val partial = df
      .withColumn("__salt", contentSalt(df, salts))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$sumCol"))
  }

  /** Generic two-phase aggregation: caller provides the partial and the
    * merge aggregate lists (must be algebraically mergeable). */
  def salted(keys: Seq[String], salts: Int,
             partialAggs: Seq[Column], mergeAggs: Seq[Column])
            (df: DataFrame): DataFrame = {
    val partial = df
      .withColumn("__salt", contentSalt(df, salts))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
