package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The training-corpus parquet sink: the write-path counterpart of the
  * q62/q69 corpus build and the q65 dataloader shard layout. The layout
  * decisions are where 100 TB writes go wrong, so each is explicit:
  *
  *   - `partitionBy` columns (default: the `split` column that
  *     [[graft.ops.Sampling.splitByHash]] assigns) become Hive-style
  *     directory partitions, so a trainer reading `split=train` prunes
  *     val/test at the FileIndex — no data read, no filter needed;
  *   - rows are `repartitionByRange(partitionBy ++ sortWithin)` before
  *     the write: every task holds one contiguous range of one
  *     partition-value's rows, so (a) each task writes into a single
  *     partition directory instead of every task appending a file to
  *     every directory (the small-files explosion: tasks × partitions
  *     files), and (b) writer parallelism within a hot partition is
  *     preserved — range-splitting a partition value across tasks avoids
  *     the one-task-per-partition bottleneck `repartition(partitionCols)`
  *     would create;
  *   - `sortWithinPartitions(sortWithin)` orders rows inside every file,
  *     so parquet row-group min/max stats on the sort key are tight and
  *     disjoint — point/range lookups (resume-from-doc, shard slicing)
  *     prune row groups instead of scanning;
  *   - `maxRecordsPerFile` bounds file size so a skewed partition value
  *     still yields dataloader-sized files rather than one giant file.
  *
  * Write mode is `overwrite` — corpus builds are snapshot-replace
  * (idempotent re-runs land the same bytes; incremental updates are the
  * job of [[graft.ops.Dedup.snapshotDiff]] upstream, not of the sink).
  */
object CorpusSink {

  /** Name of the pointer file that makes a corpus root transactional:
    * its CONTENT is the directory name of the live version. */
  val CurrentPointer = "_CURRENT"
  private val StagingDir = "_staging"
  private val VersionRe = "^v-(\\d{8})$".r

  private def fsFor(spark: org.apache.spark.sql.SparkSession,
                    path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live version's full path under `root`, or None when nothing
    * has been published yet. Readers resolve THROUGH this — they never
    * list the root — which is what makes [[publish]] atomic for them:
    * the pointer flips in one rename, so a reader sees the old layout
    * or the new one, never a mixture and never a half-written
    * directory. */
  def current(spark: org.apache.spark.sql.SparkSession,
              root: String): Option[String] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = fsFor(spark, rootP)
    val ptr = new org.apache.hadoop.fs.Path(rootP, CurrentPointer)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                 finally in.close()
      if (name.isEmpty) None
      else Some(fs.makeQualified(
        new org.apache.hadoop.fs.Path(rootP, name)).toString)
    }
  }

  /** Atomic publish — the commit protocol [[write]]/[[compact]]/
    * [[exportJsonl]] compose with so a crashed job can never leave a
    * half-written directory where a reader lists it:
    *
    *   1. the payload writes into `root/_staging/v-NNNNNNNN` — a name
    *      no reader resolves (readers go through [[current]]);
    *   2. the finished directory RENAMES to `root/v-NNNNNNNN` — one
    *      filesystem metadata op;
    *   3. the `_CURRENT` pointer file is rewritten via
    *      temp-file + overwrite-rename (`FileContext.rename(OVERWRITE)`
    *      — the POSIX/HDFS atomic-replace primitive), flipping every
    *      subsequent reader to the new version in one step.
    *
    * A crash before step 3 leaves `_CURRENT` on the OLD version —
    * readable, complete — and at worst an orphan under `_staging`/an
    * unreferenced version dir, both invisible to readers and
    * reclaimable by [[cleanStaging]]/[[prune]]. Versions are immutable
    * once published; re-publishing writes a NEW version (counter =
    * max existing + 1, zero-padded so lexical order = numeric order).
    * Single-writer by contract — concurrent publishers need the D3
    * mutex ([[EtlPipeline]]) exactly like every other exclusive step.
    * NOTE the object-store caveat: rename is atomic on HDFS-like and
    * POSIX filesystems; on S3-style stores, front this root with a
    * consistent layer the way every table format (Delta/Iceberg)
    * requires.
    *
    * Returns the published version's full path. */
  def publish(spark: org.apache.spark.sql.SparkSession, root: String)
             (writeTo: String => Unit): String = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = fsFor(spark, rootP)
    fs.mkdirs(rootP)
    val existing = fs.listStatus(rootP).map(_.getPath.getName).collect {
      case VersionRe(n) => n.toLong
    }
    val version = f"v-${if (existing.isEmpty) 1L else existing.max + 1}%08d"
    val staged = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(rootP, StagingDir), version)
    val fin = new org.apache.hadoop.fs.Path(rootP, version)
    writeTo(staged.toString)
    require(fs.exists(staged), s"publish payload wrote nothing at $staged")
    require(fs.rename(staged, fin), s"could not promote $staged to $fin")
    // pointer flip: temp + atomic overwrite-rename
    val tmp = new org.apache.hadoop.fs.Path(rootP, s"$CurrentPointer.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      rootP.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(rootP, CurrentPointer),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    fs.makeQualified(fin).toString
  }

  /** Reclaims `_staging` leftovers from crashed publishes. Never
    * touches published versions or the pointer. Returns the count. */
  def cleanStaging(spark: org.apache.spark.sql.SparkSession,
                   root: String): Int = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = fsFor(spark, rootP)
    val staging = new org.apache.hadoop.fs.Path(rootP, StagingDir)
    if (!fs.exists(staging)) 0
    else {
      val orphans = fs.listStatus(staging)
      orphans.foreach(o => fs.delete(o.getPath, true))
      orphans.length
    }
  }

  /** Deletes published versions beyond the newest `keep`, NEVER the
    * one `_CURRENT` points to (a lagging pointer keeps its target).
    * Returns the deleted paths. */
  def prune(spark: org.apache.spark.sql.SparkSession, root: String,
            keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1: $keep")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = fsFor(spark, rootP)
    val cur = current(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet
    val versions = fs.listStatus(rootP).map(_.getPath).filter(p =>
      VersionRe.pattern.matcher(p.getName).matches).sortBy(_.getName)
    versions.dropRight(keep)
      .filterNot(p => cur.contains(p.getName))
      .map { p => fs.delete(p, true); p.toString }.toSeq
  }

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Seq("split"),
            sortWithin: Seq[String] = Seq("doc_id"),
            maxRecordsPerFile: Long = 1000000L): Unit = {
    val layout = (partitionBy ++ sortWithin).map(col)
    df.repartitionByRange(layout: _*)
      .sortWithinPartitions(layout: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** [[write]]'s layout through Spark's built-in ORC source instead of
    * parquet — the interchange format a warehouse-side consumer (Hive,
    * Trino ORC tables) asks for. Same range-partition + sorted-within
    * + bounded-files discipline, so ORC's per-stripe min/max indexes
    * carry the same data-skipping the parquet layout gets; predicate
    * pushdown to the ORC reader is pinned in CorpusSinkSpec. */
  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Seq("split"),
               sortWithin: Seq[String] = Seq("doc_id"),
               maxRecordsPerFile: Long = 1000000L): Unit = {
    val layout = (partitionBy ++ sortWithin).map(col)
    df.repartitionByRange(layout: _*)
      .sortWithinPartitions(layout: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .orc(path)
  }

  /** Compaction — the maintenance job the streaming intake's delta log
    * ([[graft.streaming.CorpusStream.corpusIngestSink]]) needs
    * eventually: months of micro-batches leave thousands of small
    * `batch=N` files, and at 100 TB the scan cost of a corpus is
    * dominated by file-open/list overhead long before bytes. Reads the
    * delta log (or any parquet dir) and rewrites it through [[write]]'s
    * layout discipline — range-partitioned, sorted-within-file, file
    * sizes bounded — into `targetPath`. Run it THROUGH [[publish]]
    * (`publish(spark, root)(compact(spark, deltaPath, _))`) and the
    * swap is the pointer flip: a crash mid-compaction leaves the old
    * version readable and the delta log untouched (a compactor must
    * never delete the only copy itself — deleting the compacted delta
    * batches is a separate, after-verification step).
    *
    * Row-preserving BY CONSTRUCTION: no dedup, no filters — dedup
    * happened at ingest (hash anti-joins); compaction is purely a
    * layout rewrite, so it is safe to run at any time, idempotent, and
    * its correctness check is `count-in == count-out` (which the
    * CorpusSinkSpec pins together with the file-count collapse and the
    * preserved per-file sort). Dropping the delta-log's `batch` lineage
    * column is the one schema change, opt-out via `dropColumns = Nil`. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              deltaPath: String, targetPath: String,
              partitionBy: Seq[String] = Nil,
              sortWithin: Seq[String] = Seq("doc_id"),
              maxRecordsPerFile: Long = 1000000L,
              dropColumns: Seq[String] = Seq("batch")): Unit = {
    val raw = spark.read.option("basePath", deltaPath)
      .parquet(s"$deltaPath/batch=*")
    val pruned = dropColumns.foldLeft(raw)(_ drop _)
    write(pruned, targetPath, partitionBy, sortWithin, maxRecordsPerFile)
  }

  /** Z-ordered layout write: cluster files along the Morton curve of
    * two numeric columns so parquet min/max stats prune files for
    * range predicates on EITHER OR BOTH dimensions — the
    * multi-dimensional data-skipping layout (the Delta/Iceberg
    * OPTIMIZE ZORDER idea) that [[write]]'s lexicographic sort cannot
    * give: a time-sorted event table answers time ranges cheaply but
    * scans every file for a user predicate; z-ordered on (time, user)
    * each file covers a small rectangle of both. The curve key is
    * dropped before the write — the benefit lives in the per-file
    * min/max of the REAL columns. One tiny bounds aggregate broadcast
    * + one range Exchange on the curve key: exactly [[write]]'s
    * shuffle budget. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, nFiles: Int = 64,
                    maxRecordsPerFile: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions.{broadcast, max, min}
    import graft.functions.ZCurve
    val bounds = df.agg(
      min(col(xCol)).cast("long").as("__xlo"),
      max(col(xCol)).cast("long").as("__xhi"),
      min(col(yCol)).cast("long").as("__ylo"),
      max(col(yCol)).cast("long").as("__yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", ZCurve.zValue(
        ZCurve.scaleTo16(xCol, "__xlo", "__xhi"),
        ZCurve.scaleTo16(yCol, "__ylo", "__yhi")))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** One manifest entry of [[exportJsonl]]: shard file name, row count,
    * byte length, md5 of the exact bytes. */
  final case class ShardEntry(name: String, rows: Long, bytes: Long,
                              md5: String)

  /** JSON-lines release export with a checksummed manifest — the
    * handoff artifact a training-data delivery actually ships (and the
    * write-side twin of the q136 jsonl landing-zone ingest): sorted,
    * size-bounded `part-*.json` shards plus `manifest.json` listing
    * every shard's row count, byte length, and md5, with totals — so
    * the receiving side can verify completeness and integrity without
    * trusting the transport, and a partial copy is detectable before a
    * training run starts on it.
    *
    * Layout discipline is [[write]]'s: range-repartitioned on the sort
    * key (contiguous, disjoint shards), sorted within shards,
    * `maxRecordsPerFile`-bounded. The manifest pass streams each shard
    * once on the driver (md5 + newline count in one buffer walk) — the
    * FILE list is bounded and the bytes stream, nothing materializes;
    * at full 100 TB scale, lift the per-file checksum into a
    * distributed `binaryFile` pass and keep only the driver-side
    * manifest assembly. Returns the entries it wrote. */
  def exportJsonl(df: DataFrame, path: String,
                  sortWithin: Seq[String] = Seq("doc_id"),
                  maxRecordsPerFile: Long = 100000L): Seq[ShardEntry] = {
    df.repartitionByRange(sortWithin.map(col): _*)
      .sortWithinPartitions(sortWithin.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .json(path)
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
      .filter(f => f.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName).toSeq
      .map { f =>
        val in = fs.open(f.getPath)
        try {
          val md = java.security.MessageDigest.getInstance("MD5")
          val buf = new Array[Byte](1 << 16)
          var rows = 0L
          var r = in.read(buf)
          while (r > 0) {
            md.update(buf, 0, r)
            var i = 0
            while (i < r) { if (buf(i) == '\n') rows += 1; i += 1 }
            r = in.read(buf)
          }
          ShardEntry(f.getPath.getName, rows, f.getLen,
            md.digest().map("%02x".format(_)).mkString)
        } finally in.close()
      }
    val body = entries.map(e =>
        s"""{"name":"${e.name}","rows":${e.rows},"bytes":${e.bytes},"md5":"${e.md5}"}""")
      .mkString("[", ",", "]")
    val manifest =
      s"""{"files":$body,"n_files":${entries.size},""" +
        s""""total_rows":${entries.map(_.rows).sum},""" +
        s""""total_bytes":${entries.map(_.bytes).sum}}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(p, "manifest.json"), true)
    try out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    entries
  }
}
