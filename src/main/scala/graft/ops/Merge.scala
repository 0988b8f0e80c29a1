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

  /** SCD Type-2 history builder — the auditable upgrade of the
    * reference's destructive upsert (src/main_01.py:255-305 UPDATEs in
    * place and forgets): from a stack of keyed snapshot VERSIONS,
    * build validity intervals — one row per (key, contiguous run of
    * an unchanged value), `(id, val, valid_from, valid_to)` with
    * `valid_to` NULL while current. `valid_to` is ARITHMETIC on the
    * version axis: (next change's version) − 1, i.e. the half-open
    * interval [valid_from, next_change) rendered closed by
    * subtracting one. With contiguous version ids (0,1,2,…) that is
    * also the last OBSERVED snapshot holding the value; with sparse
    * ids (1,3,7) the bound is still correct for range predicates
    * (`valid_from <= v AND v <= valid_to` classifies every observed
    * version right) but may name a version id that was never
    * snapshotted — if consumers need observed-id bounds, feed the
    * operator dense-ranked versions. Deletions close the open interval
    * (an absent version is a real state, not a gap to paper over) and
    * re-appearances open a new one — the delete/re-add lifecycle a
    * plain change-log loses.
    *
    * Mechanics: the (key × version) grid (versions are few and
    * broadcast; the grid is |keys|·|versions| rows) left-joins the
    * observations so absence is an explicit NULL state; change points
    * fall out of one null-safe `lag` comparison, intervals from one
    * `lead` over the change points — two window passes on the same
    * per-key Exchange, never a self-join per version pair. All
    * set/compare logic is null-safe equality: no sentinel values, no
    * special-cased first version. */
  def scd2History(df: DataFrame, versionCol: String, idCol: String,
                  valCol: String): DataFrame = {
    val vals = df.select(col(versionCol).cast("long").as("__v"),
      col(idCol).as("__id"), col(valCol).as("__val"))
    val versions = vals.select("__v").distinct()
    val grid = vals.select("__id").distinct()
      .crossJoin(broadcast(versions))
    val w = Window.partitionBy("__id").orderBy("__v")
    grid.join(vals, Seq("__id", "__v"), "left")
      .withColumn("__prev", lag(col("__val"), 1).over(w))
      // a change point: value differs null-safely from the previous
      // version's state (lag = NULL before v0 ≡ absent, so appearing
      // at v0 is itself a change — no special-cased first version)
      .filter(!(col("__val") <=> col("__prev")))
      .withColumn("__to", lead(col("__v"), 1).over(w) - 1L)
      // presence intervals only; absence rows exist to CLOSE them
      .filter(col("__val").isNotNull)
      .select(col("__id").as(idCol), col("__val").as(valCol),
        col("__v").as("valid_from"), col("__to").as("valid_to"))
  }

  /** Three-way snapshot merge — the reconciliation member of the
    * versioning suite (q66 diffs two snapshots, q190/q192 certify one,
    * this merges two lines of edits off a common BASE, the VCS rule
    * applied to corpus rows): per key, whoever changed wins; both
    * changing identically agrees; both changing differently is a
    * CONFLICT surfaced as a row, never silently resolved (that is
    * [[upsert]]'s one-side-wins job, not this one's).
    *
    * Change detection is null-safe equality against base (`<=>`), so
    * adds (absent base) and deletes (absent side) fall out of the same
    * rule — delete-vs-edit is a conflict, agreeing deletes merge.
    * `resolution` ∈ base|ours|theirs|both|conflict; `merged` is the
    * winning value, NULL for deletes and conflicts (resolution
    * disambiguates which).
    *
    * Shape: two co-partitioned full-outer equi-joins on the key — the
    * one shuffle per side any keyed reconciliation needs; everything
    * after is a projection. For an audit-only pass at 100 TB, hand the
    * operator hashed values (e.g. md5(text)) and only the 32-hex
    * digests ride the shuffles; the materializing pass carries the
    * real column. */
  def threeWayMerge(idCol: String, valCol: String)
                   (base: DataFrame, ours: DataFrame,
                    theirs: DataFrame): DataFrame = {
    val b = base.select(col(idCol), col(valCol).as("__b"))
    val o = ours.select(col(idCol), col(valCol).as("__o"))
    val t = theirs.select(col(idCol), col(valCol).as("__t"))
    val oc = !(col("__o") <=> col("__b"))
    val tc = !(col("__t") <=> col("__b"))
    b.join(o, Seq(idCol), "full_outer")
      .join(t, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(!oc && !tc, "base")
          .when(oc && !tc, "ours")
          .when(!oc && tc, "theirs")
          .when(col("__o") <=> col("__t"), "both")
          .otherwise("conflict").as("resolution"),
        when(!oc && !tc, col("__b"))
          .when(oc && !tc, col("__o"))
          .when(!oc && tc, col("__t"))
          .when(col("__o") <=> col("__t"), col("__o"))
          .otherwise(lit(null)).as("merged"))
  }
}
