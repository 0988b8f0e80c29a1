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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // the NTZ→TZ cast reinterprets wall-clock micros in the session
        // zone; only UTC preserves the stored values. Enforce rather
        // than assume — an external session (GraftExtensions, a user
        // notebook) on a non-UTC JVM default would otherwise silently
        // shift every event timestamp by its zone offset.
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events requires spark.sql.session.timeZone=UTC to read " +
            "the TIMESTAMP_NTZ ts column without shifting values; got " +
            s.conf.get("spark.sql.session.timeZone"))
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => raw
      case other =>
        // schema drift in a future driver generation must surface HERE
        // with the type named, not downstream as an opaque
        // unix_micros/cast error
        throw new IllegalStateException(
          s"events.ts has unexpected parquet type $other; expected " +
            "TIMESTAMP(NANOS) (nanosAsLong long), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
