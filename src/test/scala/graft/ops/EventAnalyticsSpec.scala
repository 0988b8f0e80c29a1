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

  test("rateAnomalies: spike flags at >3σ, steady rate doesn't, zero-variance flags any deviation, cold start withheld") {
    // type 'a': 10 hours at n=4 with ±1 jitter, then a spike of 40;
    // type 'z': constant 5 for 8 hours, then 6 (zero variance → any
    // deviation flags)
    val aCounts = Seq(4, 5, 3, 4, 5, 3, 4, 5, 3, 4, 40)
    val rows =
      aCounts.zipWithIndex.flatMap { case (n, h) =>
        (1 to n).map(i => (i.toLong, f"2024-01-01 $h%02d:10:00", "a")) } ++
      (0 until 9).map(h => (1L, f"2024-01-01 $h%02d:20:00", "z")).flatMap {
        case (u, t, ty) => Seq.fill(if (t.contains("08:")) 6 else 5)((u, t, ty)) }
    val out = ev(rows).transform(EventAnalytics.rateAnomalies("ts", "event_type"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // type a: 11 buckets, first 6 withheld (w < 6) → rows for h6..h10
    val a = out("a")
    assert(a.length === 5)
    assert(a.init.forall(_._7 === 0L), "steady jitter must not flag")
    val spike = a.last
    assert(spike._3 === 40L && spike._7 === 1L, s"spike row $spike")
    // closed form at the spike: W=10 trailing counts sum S=40, Q=166
    // → dev = 40·10 − 40 = 360; z2_num = 129600; z2_den = 10·166−1600 = 60
    assert((spike._4, spike._5, spike._6) === ((10L, 129600L, 60L)))
    // type z: 9 buckets → rows h6..h8; h6/h7 steady at the constant
    // rate, h8 deviates by 1 on zero variance → flags
    val z = out("z")
    assert(z.length === 3)
    assert(z.take(2).forall(r => r._6 === 0L && r._7 === 0L), "constant rate: zero variance, no flag")
    assert(z.last._3 === 6L && z.last._6 === 0L && z.last._7 === 1L,
      s"zero-variance deviation must flag: ${z.last}")
  }

  private def ev4(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("event_id", "user_id", "ts_s", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("event_type"))

  test("statusIntervals: partition count cannot move any interval") {
    val events = ev4((1L to 40L).map(i =>
      (i, i % 5, s"2024-01-01 0${i % 8}:${10 + (i % 47)}:00", if (i % 3 == 0) "a" else "b")))
    val a = events.transform(EventAnalytics.statusIntervals(
      "user_id", "ts", "event_type", "event_id")).collect().toSet
    val b = events.repartition(7).transform(EventAnalytics.statusIntervals(
      "user_id", "ts", "event_type", "event_id")).collect().toSet
    assert(a === b)
  }

  test("statusIntervals: repeats collapse, intervals chain, the open row is current") {
    val events = ev4(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "up"),
      (2L, 1L, "2024-01-01 01:00:00", "up"),      // repeat: absorbed
      (3L, 1L, "2024-01-01 02:00:00", "down"),
      (4L, 1L, "2024-01-01 03:00:00", "up"),      // back up: NEW interval
      (5L, 2L, "2024-01-01 04:00:00", "idle")))   // lone status
    val out = events.transform(EventAnalytics.statusIntervals(
        "user_id", "ts", "event_type", "event_id"))
      .as[(Long, String, Long, Option[Long], Long)].collect()
      .sortBy(r => (r._1, r._3))
    val h = 3600000000L
    val base = 1704067200000000L
    assert(out.toSeq === Seq(
      (1L, "up", base, Some(base + 2 * h), 0L),   // repeat at +1h absorbed
      (1L, "down", base + 2 * h, Some(base + 3 * h), 0L),
      (1L, "up", base + 3 * h, None, 1L),
      (2L, "idle", base + 4 * h, None, 1L)))
    // chaining law: within a user, valid_to == next interval's valid_from
    out.groupBy(_._1).values.foreach { iv =>
      val s = iv.sortBy(_._3)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"gap between $a and $b")
        case _ =>
      }
      assert(s.init.forall(_._5 === 0L) && s.last._5 === 1L)
    }
  }

  test("activeUsers: window boundaries (day+6 in WAU, +7 out; +29 in MAU, +30 out), same-day dedup, stickiness") {
    def day(d: Int) = f"2024-01-${d + 1}%02d 12:00:00"
    val d0 = 19723L                               // 2024-01-01 as epoch days
    val events = ev(Seq(
      (1L, day(0), "view"), (1L, day(0), "click"), // same day counts once
      (2L, day(0), "view"),
      (1L, day(6), "view"),                        // d0 covers: in WAU at d6
      (3L, day(7), "view"),                        // d0 NOT in WAU at d7
      (2L, day(29), "view")))                      // d0 still in MAU at d29
    val out = events.transform(EventAnalytics.activeUsers("user_id", "ts"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(d0) === ((2L, 2L, 2L, 10000L)))
    // day 6: active {1}; WAU covers d0..d6 → {1,2}; MAU same
    assert(out(d0 + 6) === ((1L, 2L, 2L, 5000L)))
    // day 7: active {3}; WAU covers d1..d7 → {1,3} (d0 aged out of WAU)
    assert(out(d0 + 7) === ((1L, 2L, 3L, 3333L)))
    // day 29: active {2}; WAU {2,3}? — d7 is 22 days back, out of WAU
    // window (only d23..d29) → WAU {2}; MAU covers d0..d29 → all three
    assert(out(d0 + 29) === ((1L, 1L, 3L, 3333L)))
    // only active days emit rows
    assert(out.keySet === Set(d0, d0 + 6, d0 + 7, d0 + 29))
  }

  test("statusIntervals: equal-instant changes order by the id tiebreak") {
    val events = ev4(Seq(
      (10L, 1L, "2024-01-01 00:00:00", "a"),
      (11L, 1L, "2024-01-01 00:00:00", "b")))     // same ts, higher id → later
    val out = events.transform(EventAnalytics.statusIntervals(
        "user_id", "ts", "event_type", "event_id"))
      .as[(Long, String, Long, Option[Long], Long)].collect().sortBy(_._2)
    val base = 1704067200000000L
    assert(out.toSeq === Seq(
      (1L, "a", base, Some(base), 0L),            // zero-length but ordered
      (1L, "b", base, None, 1L)))
  }

  test("markovTransitions: per-user successor pairs, Laplace smoothing over the observed alphabet") {
    val events = ev4(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "A"),
      (2L, 1L, "2024-01-01 00:01:00", "B"),
      (3L, 1L, "2024-01-01 00:02:00", "A"),
      (4L, 2L, "2024-01-01 00:00:00", "B"),
      (5L, 2L, "2024-01-01 00:01:00", "B"),
      // user 3's single event produces NO transition
      (6L, 3L, "2024-01-01 00:00:00", "C")))
    val out = events.transform(EventAnalytics.markovTransitions(
        "user_id", "ts", "event_type", "event_id"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // alphabet = {A,B} (C never enters a transition); totals A:1, B:2
    assert(out === Map(
      ("A", "B") -> ((1L, 0.6667)), // (1+1)/(1+2)
      ("B", "A") -> ((1L, 0.5)),    // (1+1)/(2+2)
      ("B", "B") -> ((1L, 0.5))))
  }

  test("markovTransitions: equal instants order by the id tiebreak") {
    val events = ev4(Seq(
      (2L, 1L, "2024-01-01 00:00:00", "Y"), // same ts: id orders X before Y
      (1L, 1L, "2024-01-01 00:00:00", "X"),
      (3L, 1L, "2024-01-01 00:01:00", "Z")))
    val out = events.transform(EventAnalytics.markovTransitions(
        "user_id", "ts", "event_type", "event_id"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(out === Set(("X", "Y"), ("Y", "Z")))
  }

  test("watermarkPlanner: boundary semantics, first-batch immunity, monotone curve") {
    import org.apache.spark.sql.functions._
    // bucket 0 ends at t=10_000s; bucket 1 carries an event exactly
    // 3600 s late and one exactly 5400 s late; bucket 2 is clean
    val rows = Seq(
      (0L, 9000L), (0L, 10000L),          // first batch: pm NULL, immune
      (1L, 10000L - 3600L), (1L, 10000L - 5400L), (1L, 10500L),
      (2L, 11000L))
      .map { case (b, s) => (b, s * 1000000L) }
      .toDF("b", "us")
    val out = graft.ops.Staged.withStaged {
      EventAnalytics.watermarkPlanner(rows, col("b"), col("us"),
          Seq(0L, 1800L, 3600L, 5400L))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
    }
    // W=0: both late events drop; W=1800: both (3600 > 1800, 5400 >
    // 1800); W=3600: ONLY the 5400 s one — an event exactly W behind
    // the watermark is KEPT (Spark keeps ts >= watermark); W=5400: none
    assert(out === Map(0L -> 2L, 1800L -> 2L, 3600L -> 1L, 5400L -> 0L))
  }

  test("watermarkPlanner equals a sequential replay on generated disorder") {
    import org.apache.spark.sql.functions._
    Seq(7, 29, 53, 83, 109, 137).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 200).map { i =>
        (i.toLong / 20L, (i * 100L + rnd.nextInt(5000) - 2500L) * 1000000L)
      }
      val grid = Seq(0L, 500L, 2000L, 5000L)
      val got = graft.ops.Staged.withStaged {
        EventAnalytics.watermarkPlanner(rows.toDF("b", "us"),
            col("b"), col("us"), grid)
          .as[(Long, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
      }
      // reference: per bucket, prior-buckets max; strict-less drop rule
      val byB = rows.groupBy(_._1).toSeq.sortBy(_._1)
      val maxes = byB.map { case (b, rs) => b -> rs.map(_._2).max }
      val pm = maxes.indices.map { i =>
        maxes(i)._1 -> (if (i == 0) None
          else Some(maxes.take(i).map(_._2).max))
      }.toMap
      grid.foreach { w =>
        val dropped = rows.count { case (b, us) =>
          pm(b).exists(p => us < p - w * 1000000L) }
        assert(got(w) === ((rows.size.toLong, dropped.toLong)),
          s"seed=$seed W=$w")
      }
    }
  }
}
