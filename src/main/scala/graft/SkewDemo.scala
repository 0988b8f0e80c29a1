package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** As-of join hot-key demonstration (BENCHNOTES evidence): build a
  * deliberately skewed probe side — `SPARK_GRAFT_SKEW_FACTOR`
  * replications of sf events with ~90% of rows remapped to ONE user —
  * and time [[graft.ops.AsOfJoin.join]] default vs the `timeBucket`
  * variant on it. The default path funnels the hot key's rows through
  * one window task; the bucketed path sub-partitions the key by
  * day so the same rows spread across (key, bucket) tasks, with the
  * cross-bucket carry ranking one head row per bucket.
  *
  * Both paths are also count-compared so the demo can never report a
  * speedup for a wrong answer.
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SKEW_FACTOR", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir)
    // replicate with shifted ids/timestamps, then remap ~90% of rows to
    // user 1 — the hot key; keep event times spread over the original
    // range so day-bucketing has buckets to spread across
    val skewed = (0 until factor).map { r =>
      ev.select(
        (col("event_id") + lit(r * 100000000L)).as("event_id"),
        when(pmod(col("event_id"), lit(10)) < 9, lit(1L))
          .otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_type"), col("value"))
    }.reduce(_ unionAll _)
    val left = skewed.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val right = skewed.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    left.persist(); right.persist()
    val nLeft = left.count(); val nRight = right.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm both paths once (codegen), then measure
    graft.ops.AsOfJoin.join(left.limit(1000), right.limit(1000),
      Seq("user_id"), "ts", Seq("value")).count()
    val (tDefault, nDefault) = time(graft.ops.AsOfJoin.join(
      left, right, Seq("user_id"), "ts", Seq("value")).count())
    val (tBucketed, nBucketed) = time(graft.ops.AsOfJoin.join(
      left, right, Seq("user_id"), "ts", Seq("value"),
      timeBucket = Some(ts => date_trunc("day", ts))).count())
    require(nDefault == nBucketed,
      s"bucketed path diverged: $nDefault vs $nBucketed")
    println(s"""{"metric":"asof_skew_demo","left_rows":$nLeft,"right_rows":$nRight,"hot_key_share":0.9,"default_sec":${math.round(tDefault * 100) / 100.0},"bucketed_sec":${math.round(tBucketed * 100) / 100.0},"rows":$nDefault,"sf_dir":"$sfDir","factor":$factor}""")
    spark.stop()
  }
}
