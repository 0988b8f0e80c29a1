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

  /** Shuffle-skew audit for a prospective join/group key — the
    * MEASUREMENT half of this file (salting is the remedy; this says
    * whether and how much to apply): the top `topK` heaviest key
    * values with their corpus share, plus the global read broadcast
    * onto every row — `max_over_avg_x100` (how many times the average
    * key mass the heaviest key carries, ×100) and `salt_buckets`, the
    * fan-out [[salted]] / `Merge.lastWriterWins(saltBuckets)` would
    * need so the hot key's rows fit one average task at `parts`
    * shuffle partitions: ceil(max_cnt · parts / n_rows), which reads
    * 1 exactly when no key exceeds an average partition — "don't
    * salt" is a first-class answer.
    *
    * NULL keys are audited as the literal `__null__` bucket — in real
    * data null is routinely THE hot key, so the audit must rank it,
    * not drop it. Exact integers; `max·n_keys` rides DECIMAL(38,0)
    * (both factors grow with the corpus).
    *
    * Shape: one key-grain count aggregate (staged — the totals and
    * top-k branches share it), a TakeOrderedAndProject for the top-k,
    * and a single-row broadcast. */
  def skewAudit(keyCol: String, topK: Int = 20, parts: Int = 32)
               (df: DataFrame): DataFrame = {
    require(topK >= 1 && parts >= 1, s"topK=$topK parts=$parts")
    val counts = Staged.stage(df
      .groupBy(coalesce(col(keyCol).cast("string"), lit("__null__")).as("key"))
      .agg(count(lit(1)).as("cnt")))
    val totals = counts.agg(sum("cnt").as("n_rows"),
      count(lit(1)).as("n_keys"), max("cnt").as("max_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        expr("cnt * 10000 DIV n_rows").as("share_bp"),
        col("rank"), col("n_rows"), col("n_keys"),
        expr("cast(max_cnt as decimal(38,0)) * n_keys * 100 DIV n_rows")
          .as("max_over_avg_x100"),
        expr(s"(max_cnt * $parts + n_rows - 1) DIV n_rows")
          .as("salt_buckets"))
  }

  /** Scan-parallelism fan-out for CPU-dense per-row chains (the
    * round-11 optimization round's measured finding): a scan that
    * yields FEWER partitions than the cluster's parallelism serializes
    * every scan-side projection on a handful of cores — the
    * "unsplittable input" form of input skew (one file, one parquet
    * row group: byte-range splitting can't parallelize it, because all
    * rows land in the split holding the row group's midpoint). The
    * engine deliberately pushes its per-row work scan-side (normalize,
    * langId, URL canonicalization, shingling) to avoid shuffles, which
    * makes those chains exactly the work such a scan serializes:
    * profiled at sf0.1, the corpus-gate chain ran 2.7 s of CPU on ONE
    * of 32 cores, and the q207 canonicalization 2.6 s — wall-clock
    * that 32-way parallelism turns into ~0.1 s.
    *
    * The fix is the optimization guide's own remedy — "repartition
    * immediately after the read" — made SCALE-ADAPTIVE: it engages
    * only when the frame has fewer partitions than
    * `defaultParallelism`, so on a real cluster (where a corpus scan
    * yields thousands of splits ≥ cores) it is a structural no-op and
    * the plan keeps its shuffle count; locally it inserts one
    * id-hashed Exchange of the thin scan output. Hash partitioning on
    * the caller's unique id (never round-robin) keeps the row→
    * partition map DETERMINISTIC under task retry/speculation
    * (SPARK-38388's lesson) and skips round-robin's
    * sort-before-repartition pass. The explicit partition count marks
    * the exchange REPARTITION_BY_NUM, which AQE respects (it would
    * coalesce a bare repartition-by-column right back to one
    * partition at these byte sizes — byte-based sizing is the wrong
    * ruler for CPU-dense rows).
    *
    * The engagement test never inspects the frame (computing a
    * DataFrame's partition count forces physical planning, and — under
    * AQE, on a frame with upstream exchanges — executes stages at
    * plan-BUILD time, which would corrupt the lazy-plan contract).
    * Instead the session's entry point (Bench/Verify/Profile) probes
    * the INPUT LAYOUT once — `ceil(dirBytes / maxPartitionBytes)`, the
    * same arithmetic the file-scan planner applies — and records it as
    * `spark.graft.scanParallelism`. The helper engages only when that
    * recorded scan parallelism is below `defaultParallelism`; with the
    * conf UNSET it is a structural no-op, so library users and the
    * plan-pinning specs see the unmodified (cluster) plan shape.
    *
    * Results are invariant by construction: every downstream operator
    * in this codebase is partition-order-independent (aggregations,
    * equi-joins, explicitly-ordered windows — the house determinism
    * discipline), and the full DuckDB oracle gate re-certifies it. */
  def fanOutForCpu(df: DataFrame, keys: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "fanOutForCpu needs at least one hash key")
    val spark = df.sparkSession
    val scanParts = spark.conf.getOption(ScanParallelismKey).map(_.toInt)
    val target = spark.sparkContext.defaultParallelism
    if (scanParts.forall(_ >= target)) df
    else df.repartition(target, keys: _*)
  }

  /** Session conf key recording the input layout's scan parallelism —
    * see [[fanOutForCpu]]. Set by entry points via
    * [[recordScanParallelism]]; unset = assume the scan is already
    * wide (the cluster default). */
  val ScanParallelismKey = "spark.graft.scanParallelism"

  /** Probe `sfDir`'s layout and record its scan parallelism on the
    * session: the partition count the file-scan planner would give the
    * directory's bytes at `spark.sql.files.maxPartitionBytes` — 1 for
    * the single-file fixture tables, thousands at corpus scale. */
  def recordScanParallelism(spark: org.apache.spark.sql.SparkSession,
                            sfDir: String): Unit = {
    val maxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
      .stripSuffix("b").toLong
    val bytes = dirBytes(spark.sparkContext.hadoopConfiguration, sfDir)
    spark.conf.set(ScanParallelismKey,
      math.max(1L, (bytes + maxSplit - 1) / maxSplit).toString)
  }

  /** The round-10 soak's partition-sizing lesson as a FUNCTION (it was
    * an env var, `SPARK_GRAFT_SHUFFLE`): q62's one superlinear cell at
    * 10× data was 78.8 GB of spill at the 32-partition local pin, and
    * re-running at 256 partitions cut it 2.6× with spill at 19.5 GB —
    * the plan was right, the partition count wasn't. The rule a
    * cluster's AQE applies is the same arithmetic: partitions ≈ input
    * bytes / target partition bytes (128 MB — the shuffle-block size
    * that fits executor memory with codec+sort headroom), clamped
    * below by the parallelism floor (never fewer partitions than
    * cores) and above by a sanity cap (beyond ~200k partitions,
    * scheduler overhead dominates any spill win). Deterministic,
    * monotone in `inputBytes`, and the LOCAL fixture scales resolve to
    * the floor — so wiring it into Verify/Bench changes nothing at
    * sf≤0.1 and only engages on soak-scale inputs, exactly the regime
    * the lesson came from. */
  def suggestedShufflePartitions(inputBytes: Long,
                                 targetPartitionBytes: Long = 128L << 20,
                                 minParts: Int = 32,
                                 maxParts: Int = 200000): Int = {
    require(inputBytes >= 0 && targetPartitionBytes > 0 &&
      minParts >= 1 && maxParts >= minParts,
      s"bytes=$inputBytes target=$targetPartitionBytes min=$minParts max=$maxParts")
    val raw = (inputBytes + targetPartitionBytes - 1) / targetPartitionBytes
    math.min(maxParts.toLong, math.max(minParts.toLong, raw)).toInt
  }

  /** Driver-side byte probe for [[suggestedShufflePartitions]]: the
    * total on-disk size under `path` (recursive). One filesystem
    * listing — the same metadata a FileIndex reads; never opens data. */
  def dirBytes(hadoopConf: org.apache.hadoop.conf.Configuration,
               path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }
}
