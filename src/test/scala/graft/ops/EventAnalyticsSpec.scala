package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("event_type"))

  test("funnel: order, strictness, and the conversion window all gate a step") {
    val events = ev(Seq(
      // completes the whole funnel inside the window
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 01:00:00", "click"),
      (1L, "2024-01-01 02:00:00", "purchase"),
      // click only BEFORE the first view → stops after view
      (2L, "2024-01-01 00:00:00", "click"),
      (2L, "2024-01-01 01:00:00", "view"),
      // click 25h after view → outside the 24h window
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-02 01:00:00", "click"),
      // purchase BEFORE the click → stops after click
      (4L, "2024-01-01 00:00:00", "view"),
      (4L, "2024-01-01 00:30:00", "purchase"),
      (4L, "2024-01-01 01:00:00", "click"),
      // never views → not in the funnel at all
      (5L, "2024-01-01 00:00:00", "click"),
      (5L, "2024-01-01 01:00:00", "purchase"),
      // click at the EXACT view instant → strict > excludes it
      (6L, "2024-01-01 00:00:00", "view"),
      (6L, "2024-01-01 00:00:00", "click")))
    val out = events.transform(EventAnalytics.funnel("user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinUs = Some(24L * 3600 * 1000000)))
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, "view", 5L), (2L, "click", 2L), (3L, "purchase", 1L)))
    assert(out.map(_._4).toSeq === Seq(1.0, 0.4, 0.2))
  }

  test("funnel: without a window the late conversion counts; boundary instant is inclusive") {
    val events = ev(Seq(
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-02 01:00:00", "click"),       // 25h later
      (7L, "2024-01-01 00:00:00", "view"),
      (7L, "2024-01-02 00:00:00", "click")))      // exactly 24h: <= keeps it
    val unwindowed = events.transform(EventAnalytics.funnel(
        "user_id", "ts", "event_type", Seq("view", "click")))
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(unwindowed.map(_._3).toSeq === Seq(2L, 2L))
    val windowed = events.transform(EventAnalytics.funnel(
        "user_id", "ts", "event_type", Seq("view", "click"),
        withinUs = Some(24L * 3600 * 1000000)))
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(windowed.map(_._3).toSeq === Seq(2L, 1L), "24h boundary kept, 25h dropped")
  }

  test("cohortRetention: first-day cohorts, distinct-per-day counting, per-cohort normalization") {
    val events = ev(Seq(
      (1L, "2024-01-01 08:00:00", "view"),        // A: cohort d0
      (1L, "2024-01-03 09:00:00", "click"),       // A active d0+2 …
      (1L, "2024-01-03 10:00:00", "view"),        // … twice the same day: counts once
      (2L, "2024-01-01 23:00:00", "view"),        // B: cohort d0, never returns
      (3L, "2024-01-02 00:00:00", "view"),        // C: cohort d1
      (3L, "2024-01-03 01:00:00", "click")))      // C active d1+1
    val d0 = 19723L                               // 2024-01-01 as epoch days
    val out = events.transform(EventAnalytics.cohortRetention("user_id", "ts"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out === Set(
      (d0, 0L, 2L, 1.0),                          // A+B on day 0
      (d0, 2L, 1L, 0.5),                          // only A returns
      (d0 + 1, 0L, 1L, 1.0),
      (d0 + 1, 1L, 1L, 1.0)))
  }
}
