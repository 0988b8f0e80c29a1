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

  /** Compaction — the maintenance job the streaming intake's delta log
    * ([[graft.streaming.CorpusStream.corpusIngestSink]]) needs
    * eventually: months of micro-batches leave thousands of small
    * `batch=N` files, and at 100 TB the scan cost of a corpus is
    * dominated by file-open/list overhead long before bytes. Reads the
    * delta log (or any parquet dir) and rewrites it through [[write]]'s
    * layout discipline — range-partitioned, sorted-within-file, file
    * sizes bounded — into `targetPath`, then the caller swaps
    * directories (kept out of this function: the swap is the same
    * rename-aside dance as [[graft.streaming.EventStream.upsertSink]],
    * and a compactor must never delete the only copy itself).
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
}
