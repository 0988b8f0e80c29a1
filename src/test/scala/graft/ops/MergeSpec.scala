package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (user, type, ts, value)
    (1L, "click", 10L, 1.0),
    (1L, "click", 20L, 2.0), // later → wins
    (1L, "view", 5L, 3.0),
    (2L, "click", 7L, 4.0)
  ).toDF("user_id", "event_type", "ts", "value")

  test("U1: last-writer-wins keeps exactly the latest row per key") {
    val out = Merge.lastWriterWins(Seq("user_id", "event_type"), Seq(col("ts").desc))(events)
      .orderBy("user_id", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out === Seq((1L, "click", 20L, 2.0), (1L, "view", 5L, 3.0), (2L, "click", 7L, 4.0)))
  }

  test("U3: merge is idempotent — double-run equals single-run") {
    val once = Merge.lastWriterWins(Seq("user_id", "event_type"), Seq(col("ts").desc))(events)
    val twice = Merge.lastWriterWins(Seq("user_id", "event_type"), Seq(col("ts").desc))(once)
    assert(once.exceptAll(twice).count() === 0 && twice.exceptAll(once).count() === 0)
  }

  test("U1: merge result is invariant to ingest order (distinct versions)") {
    val shuffled = events.orderBy(rand(42))
    val a = Merge.lastWriterWins(Seq("user_id", "event_type"), Seq(col("ts").desc))(events)
    val b = Merge.lastWriterWins(Seq("user_id", "event_type"), Seq(col("ts").desc))(shuffled)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("salted two-phase LWW is output-identical on a hot-key fixture") {
    // one key holds 90% of the rows — the shape where the single-window
    // merge funnels into one reducer and the salted variant spreads it
    val skewed = ((0L until 900L).map(i => (1L, "hot", i, i * 0.5)) ++
      (0L until 100L).map(i => (2L + i % 7, "cold", i, i * 1.0)))
      .toDF("user_id", "event_type", "ts", "value")
    val keys = Seq("user_id", "event_type")
    val plain = Merge.lastWriterWins(keys, Seq(col("ts").desc))(skewed)
    val salted = Merge.lastWriterWins(keys, Seq(col("ts").desc), saltBuckets = 16)(skewed)
    assert(plain.exceptAll(salted).count() === 0 &&
      salted.exceptAll(plain).count() === 0)
    // and the salted plan really partitions phase 1 on the salt column
    val windows = salted.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.exists(_.partitionSpec.exists(_.sql.contains("__salt"))),
      windows.mkString("\n"))
  }

  test("upsert: incoming beats existing on key collision; both sides' unique keys survive") {
    val existing = Seq((1L, "click", 100L, 9.0), (3L, "view", 1L, 5.0))
      .toDF("user_id", "event_type", "ts", "value")
    val out = Merge.upsert(existing, events, Seq("user_id", "event_type"), Seq(col("ts").desc))
    val m = out.as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m((1L, "click")) === ((20L, 2.0))) // incoming won despite older ts
    assert(m((3L, "view")) === ((1L, 5.0)))   // existing-only key kept
    assert(m.size === 4)
  }
}
