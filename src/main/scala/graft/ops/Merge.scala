package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge / dedup — the reference's signature operator (SURVEY §2.4).
  *
  * The reference upserts row-at-a-time into MariaDB keyed on
  * `(DataTurno, Tear)` — if the key exists UPDATE else INSERT, i.e.
  * last-writer-wins per key (reference src/main_01.py:255-305, existence
  * probe :235-253). Spark is immutable, so merge = union + window-dedup:
  * `row_number() over (partition by key order by version desc) = 1`.
  *
  * Scale notes (100 TB): the window shuffles once on the key columns —
  * the same shuffle a GROUP BY would need, so this is optimal. The
  * reference's tiebreak is nondeterministic arrival order; we pin it to an
  * explicit version column list (e.g. ts desc, event_id desc) so the merge
  * is deterministic and idempotent (U3: running it twice == once).
  */
object Merge {

  /** U1 — last-writer-wins dedup on `keys`, latest by `version` ordering.
    *
    * `saltBuckets > 1` opts into the two-phase skew variant for
    * pathologically hot keys: phase 1 splits each key's rows across
    * `saltBuckets` deterministic sub-buckets (content hash over all
    * columns — no RNG, so re-runs are identical) and keeps each bucket's
    * winner; phase 2 picks the global winner among the ≤ saltBuckets
    * survivors. Output-identical to the unsalted path whenever `version`
    * is a TOTAL ordering per key (the determinism contract this operator
    * already requires); the hot key's rows now spread over saltBuckets
    * tasks instead of funneling into one reducer. The default stays
    * single-phase: WindowGroupLimit's map-side partial already bounds
    * shuffled bytes by distinct keys, so salting only pays when one
    * key's row count dwarfs a task. */
  def lastWriterWins(keys: Seq[String], version: Seq[Column],
                     saltBuckets: Int = 1)(df: DataFrame): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    def keep1(d: DataFrame, parts: Seq[String]): DataFrame = {
      val w = Window.partitionBy(parts.map(col): _*).orderBy(version: _*)
      d.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
    if (saltBuckets == 1) keep1(df, keys)
    else {
      val salted = df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
      keep1(keep1(salted, keys :+ "__salt"), keys).drop("__salt")
    }
  }

  /** U1 as a two-sided MERGE: new rows win over existing rows with the same
    * key; within each side, latest `version` wins. `existing` and `incoming`
    * must share schemas. Mirrors the reference's upsert-into-sink shape.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             version: Seq[Column]): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)))
    lastWriterWins(keys, col("__src").desc +: version)(tagged).drop("__src")
  }
}
