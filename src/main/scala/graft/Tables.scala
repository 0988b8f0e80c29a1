package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (repo:TESTDATA.md).
  *
  * The reference's "catalog" is a time-partitioned CSV directory tree
  * (reference src/main_02.py:392-440); here the equivalent catalog surface
  * is a set of named parquet tables rooted at a scale-factor directory.
  * All readers go through `spark.read.parquet` so Catalyst gets columnar
  * scans with predicate pushdown + column pruning for free.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some driver
    * generations (which Spark's vectorized reader rejects —
    * [PARQUET_TYPE_ILLEGAL] — so it's read as raw nanos via
    * `nanosAsLong` and converted) and TIMESTAMP(MICROS) in others
    * (read as TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ).
    * Dispatch on the type the scan actually produced; every path lands
    * on a session-TZ TimestampType of the stored microseconds (sessions
    * run UTC, so the NTZ→TZ cast is value-preserving and `unix_micros`
    * matches DuckDB's `epoch_us` over the same file). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
