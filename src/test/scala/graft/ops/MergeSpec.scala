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
