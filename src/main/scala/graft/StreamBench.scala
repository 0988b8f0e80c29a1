package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming intake throughput benchmark (BENCHNOTES evidence): replay
  * the documents table through the full [[graft.streaming.CorpusStream]]
  * intake — json landing zone → stateless gate chain →
  * watermark-bounded within-stream dedup → against-corpus anti-join
  * sink — under Trigger.AvailableNow, and report end-to-end rows/sec.
  *
  * The input is `SPARK_GRAFT_STREAM_REPLICAS` (default 8) copies of the
  * corpus with distinct doc_ids and same text, so the dedup stages do
  * real work (the sink keeps ~1/replicas of the input). Wall time spans
  * start→awaitTermination: listing, gating, state, anti-joins, writes.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPLICAS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("streambench").toString

    val docs = Tables.documents(spark, sfDir)
    val intake = (0 until replicas).map { r =>
      docs.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        // all event times inside one watermark horizon so the
        // within-stream dedup state actually carries across batches
        timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(300L))).as("ts"),
        col("text"), col("lang"), col("source"))
    }.reduce(_ unionAll _)
    intake.repartition(16).write.json(s"$work/in")
    val inputRows = intake.count()

    val stream = graft.streaming.CorpusStream.dedupedDocs(
      graft.streaming.CorpusStream.cleanDocs(
        graft.streaming.CorpusStream.readDocs(spark, s"$work/in")))
    val t0 = System.nanoTime()
    val q = graft.streaming.CorpusStream
      .corpusIngestSink(stream, s"$work/sink", s"$work/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val novel = spark.read.parquet(s"$work/sink/batch=*").count()
    println(s"""{"metric":"stream_intake_rows_per_sec","value":${(inputRows / secs).round},"unit":"rows/sec","input_rows":$inputRows,"novel_rows":$novel,"secs":${math.round(secs * 100) / 100.0},"replicas":$replicas,"sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
