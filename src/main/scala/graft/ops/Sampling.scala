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

  /** Hex threshold for a [0,1] rate at 2-hex-digit (1/256) granularity.
    * A rate that rounds to 256 must compare above EVERY 2-hex-digit
    * bucket: "100" would sort below "11".."ff" lexicographically, so the
    * keep-all sentinel is "g" ('g' > 'f' > '9'). */
  private[ops] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0,1]")
    val n = math.round(rate * 256).min(256)
    if (n >= 256) "g" else f"$n%02x"
  }

  /** The sampling key: first two hex chars of md5 of the id rendered as a
    * string — portable across engines (DuckDB computes the identical
    * digest, unlike xxhash64), uniform, and independent of row order. */
  def hashBucket(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2)

  /** Keep a row iff its hash bucket falls under its stratum's threshold.
    * `rates` maps stratum values to sampling rates (granularity 1/256);
    * unlisted strata use `defaultRate`. Deterministic, idempotent, and
    * exactly reproducible by any engine that can compute md5. Because the
    * keep-set at rate r is `bucket < threshold(r)`, samples are NESTED:
    * raising a rate only ever ADDS rows — the consistency property
    * mixture/curriculum pipelines rely on when re-weighting a source. */
  def stratifiedByHash(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val thresh = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < thresh)
  }

  /** Assign every row to exactly one named split (train/val/test …) by
    * cumulative hash-threshold ranges. Assignment is a pure function of
    * the id: stable across runs, engines, partitionings, and corpus
    * growth (a doc never migrates between splits when new docs arrive —
    * the property that keeps eval sets uncontaminated). `splits` rates
    * must sum to 1; granularity is 1/256. */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split rates must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val bucket = hashBucket(col(idCol))
    val assign = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), c)) =>
          when(bucket < lit(hexThreshold(c)), name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Deterministic global shuffle + round-robin shard layout — how a
    * training run turns a corpus into dataloader shards: rows get a
    * pseudo-random but reproducible total order (md5 of seed+id, id as
    * tiebreak for md5-collision safety), then deal round-robin into
    * `nShards` shards balanced to within one row; within-shard order is
    * the shuffle order. A new `seed` is a fresh permutation (per-epoch
    * reshuffle) with zero state kept between runs.
    *
    * Scale: built on the two-phase rank ([[TopK.withPosition]]) — one
    * range shuffle plus a cluster-sized offsets join, never a
    * single-partition window. The output feeds
    * `repartition(shard) + sortWithinPartitions(pos)` as the physical
    * write layout, which adds the one hash shuffle any sharded write
    * pays. Adds `pos` (0-based global shuffle position, long) and
    * `shard` (int). */
  def shuffleShards(idCol: String, nShards: Int, seed: String = "")
                   (df: DataFrame): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    TopK.withPosition(Seq(key, col(idCol)), "pos")(df)
      .withColumn("pos", col("pos") - 1)
      .withColumn("shard", pmod(col("pos"), lit(nShards.toLong)).cast("int"))
  }
}
