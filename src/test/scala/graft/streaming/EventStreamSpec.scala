package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("shiftWindowAgg: 8h tumbling windows with watermark, late data folded in") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.shiftWindowAgg(src.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("shift_agg")
      .outputMode("complete").start()
    src.addData(
      Ev(1, t(1), 10, "click", 1.0, "{}"),
      Ev(2, t(7), 10, "click", 2.0, "{}"),
      Ev(3, t(9), 11, "view", 5.0, "{}"))
    q.processAllAvailable()
    src.addData(Ev(4, t(2), 12, "click", 4.0, "{}")) // late but within watermark
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM shift_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    assert(rows === Set(
      ("2024-01-01 00:00:00.0", "click", 3L, 7.0),
      ("2024-01-01 08:00:00.0", "view", 1L, 5.0)))
  }

  test("sessionize: events within the gap share a session, others split") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.sessionize(src.toDF(), gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    src.addData(
      Ev(1, t(1, 0), 10, "click", 1.0, "{}"),
      Ev(2, t(1, 20), 10, "click", 1.0, "{}"),  // same session (gap 20m)
      Ev(3, t(3, 0), 10, "click", 1.0, "{}"))   // new session
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, n_events FROM sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    q.stop()
    assert(rows === Seq((10L, 1L), (10L, 2L)))
  }

  test("dedupedEvents: replayed event_ids are dropped across micro-batches, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.dedupedEvents(src.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    src.addData(
      Ev(1, t(1), 10, "click", 1.0, "{}"),
      Ev(1, t(1), 10, "click", 1.0, "{}"), // intra-batch dupe
      Ev(2, t(2), 11, "view", 5.0, "{}"))
    q.processAllAvailable()
    // source replay: same event_id arrives again in a later micro-batch
    src.addData(Ev(1, t(1), 10, "click", 1.0, "{}"),
      Ev(3, t(3), 10, "click", 2.0, "{}"))
    q.processAllAvailable()
    val ids = spark.sql("SELECT event_id FROM deduped").as[Long].collect().sorted
    q.stop()
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("readEvents file source: json-lines directory streams through shiftWindowAgg") {
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    val src = dir.resolve("in"); java.nio.file.Files.createDirectories(src)
    java.nio.file.Files.write(src.resolve("b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T01:00:00.000Z","user_id":10,"event_type":"click","value":2.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T09:00:00.000Z","user_id":10,"event_type":"click","value":3.0,"props":"{}"}""")
      .mkString("\n").getBytes)
    val stream = EventStream.readEvents(spark, src.toString)
    assert(stream.isStreaming)
    val q = EventStream.shiftWindowAgg(stream, watermark = "1 hour")
      .writeStream.format("memory").queryName("file_shift_agg")
      .outputMode("complete").start()
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n FROM file_shift_agg ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    q.stop()
    assert(rows === Seq(("click", 1L), ("click", 1L))) // two 8h windows
  }

  test("userRunningState: custom keyed state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.userRunningState(src.toDF())
      .writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()
    src.addData(Ev(1, t(1), 10, "click", 2.0, "{}"),
      Ev(2, t(2), 10, "click", 3.0, "{}"))
    q.processAllAvailable()
    src.addData(Ev(5, t(3), 10, "view", 5.0, "{}"),
      Ev(6, t(3), 11, "view", 7.0, "{}"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, n_events, total_value, last_event_id FROM user_state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    q.stop()
    // latest update per user wins: user 10 accumulated across both batches
    val latest = rows.groupBy(_._1).map { case (_, g) => g.maxBy(_._2) }.toSet
    assert(latest === Set((10L, 3L, 10.0, 5L), (11L, 1L, 7.0, 6L)))
  }

  test("closedSessions: sessions emit exactly once — on gap or on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.closedSessions(src.toDF(), gapMinutes = 30, watermark = "5 minutes")
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    // batch 1: one open session for user 10 — nothing emits yet
    src.addData(Ev(1, t(1, 0), 10, "click", 1.0, "{}"),
      Ev(2, t(1, 10), 10, "click", 2.0, "{}"))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM closed_sessions").count() === 0)
    // batch 2: event past the gap closes the first session (gap path)
    src.addData(Ev(3, t(3, 0), 10, "click", 4.0, "{}"))
    q.processAllAvailable()
    val afterGap = spark.sql(
      "SELECT user_id, n_events, total_value FROM closed_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(afterGap === Seq((10L, 2L, 3.0)))
    // batch 3: far-future event for another user pushes the watermark
    // past session-2's end + gap → timeout path flushes user 10's
    // remaining open session
    src.addData(Ev(4, t(9, 0), 99, "view", 0.5, "{}"))
    q.processAllAvailable()
    src.addData(Ev(5, t(9, 1), 99, "view", 0.5, "{}"))
    q.processAllAvailable()
    val all = spark.sql(
      "SELECT user_id, n_events, total_value FROM closed_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(all.contains((10L, 1L, 4.0)), s"timeout flush missing: $all")
  }

  test("clickPurchaseJoin: stream-stream join matches purchases within the hour before a click") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.clickPurchaseJoin(src.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    src.addData(
      Ev(1, t(10, 0), 7, "purchase", 50.0, "{}"),  // 30 min before click → match
      Ev(2, t(10, 30), 7, "click", 1.0, "{}"),
      Ev(3, t(8, 0), 7, "purchase", 99.0, "{}"),   // >1h before click → no match
      Ev(4, t(10, 15), 8, "click", 1.0, "{}"))     // other user, no purchase
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, click_id, purchase_value FROM ss_join")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows === Set((7L, 2L, 50.0)))
  }

  test("upsertSink: a crash inside the swap window recovers to exactly-once output") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sinkcrash").toString
    val sink = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val src = MemoryStream[Ev]
    val q = EventStream.upsertSink(src.toDF(), sink, ckpt).start()
    src.addData(Ev(1, t(1), 10, "click", 1.0, "{}"),
      Ev(2, t(1), 11, "view", 2.0, "{}"))
    q.processAllAvailable()
    q.stop()
    // simulate dying between rename-aside and swap-in: the sink path is
    // gone and the full previous state sits at .old — the worst instant
    // of the write-then-swap protocol
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(sink),
      new org.apache.hadoop.fs.Path(s"$sink.old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(sink)))
    // restart from the same checkpoint; the next batch must first restore
    // the sink from .old, then merge — no batch-1 row may be lost and the
    // same-key update must still win exactly once
    val q2 = EventStream.upsertSink(src.toDF(), sink, ckpt).start()
    src.addData(Ev(3, t(2), 10, "click", 9.0, "{}"))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(sink)
      .select("user_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((10L, "click", 9.0), (11L, "view", 2.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sink.old")))
  }

  test("upsertSink: micro-batches merge with last-writer-wins into the sink") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val sink = s"$dir/out"
    val src = MemoryStream[Ev]
    val q = EventStream.upsertSink(src.toDF(), sink, s"$dir/ckpt").start()
    src.addData(Ev(1, t(1), 10, "click", 1.0, "{}"))
    q.processAllAvailable()
    src.addData(Ev(2, t(2), 10, "click", 9.0, "{}"), // same key, later ts → wins
      Ev(3, t(2), 11, "view", 3.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(sink)
      .select("user_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((10L, "click", 9.0), (11L, "view", 3.0)))
  }

  test("funnelMonitor: streaming reading equals the batch funnel after any prefix, out-of-order arrival included") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val win = Some(24L * 3600 * 1000000)
    def latest(table: String): Map[Long, (Long, Seq[Long])] =
      spark.table(table)
        .groupBy("user_id")
        .agg(max(struct(col("stage"), col("reached_us"))).as("s"))
        .select(col("user_id"), col("s.stage"), col("s.reached_us"))
        .as[(Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    def batchStages(evs: Seq[Ev]): Map[Long, Long] = {
      val counts = evs.toDF()
        .transform(graft.ops.EventAnalytics.funnel("user_id", "ts", "event_type",
          steps, withinUs = win))
        .as[(Long, String, Long, Double)].collect()
      // invert the aggregate: recompute per-user stage from the same DP
      // driver-side for the per-user comparison
      val byUser = evs.groupBy(_.user_id)
      byUser.map { case (u, es) =>
        val times = steps.map(s =>
          es.filter(_.event_type == s).map(e => e.ts.getTime * 1000L).distinct.sorted)
        var prev = Option.empty[Long]; var open = true; var stage = 0L
        times.foreach { ts =>
          if (open) {
            val cand = prev match {
              case None    => ts.headOption
              case Some(p) => ts.find(t => t > p && win.forall(t - p <= _))
            }
            cand match { case Some(t) => stage += 1; prev = Some(t)
                         case None => open = false }
          }
        }
        // cross-check the aggregate counts from the REAL batch operator
        assert(counts.length === steps.size)
        u -> stage
      }
    }
    val src = MemoryStream[Ev]
    val q = EventStream.funnelMonitor(src.toDF(), steps, win).writeStream
      .format("memory").queryName("funnel_mon").outputMode("update").start()
    try {
      // batch 1: user 1's CLICK arrives BEFORE its enabling view (which
      // comes in batch 2, earlier in event time) — the order-insensitivity
      // case an incremental fold gets wrong; user 2 views only
      val b1 = Seq(
        Ev(1, t(5), 1, "click", 0, "{}"),
        Ev(2, t(6), 1, "purchase", 0, "{}"),
        Ev(3, t(1), 2, "view", 0, "{}"))
      src.addData(b1: _*)
      q.processAllAvailable()
      val r1 = latest("funnel_mon")
      assert(r1(1L)._1 === 0L, "click/purchase without a view reach nothing")
      assert(r1(2L)._1 === 1L)
      // batch 2: user 1's view lands (event time BEFORE the click) —
      // the DP must now recover the full chain retroactively; replay
      // batch 1's click verbatim too (at-least-once)
      src.addData(Ev(4, t(2), 1, "view", 0, "{}"), Ev(1, t(5), 1, "click", 0, "{}"))
      q.processAllAvailable()
      val r2 = latest("funnel_mon")
      assert(r2(1L)._1 === 3L, s"retroactive enablement failed: $r2")
      assert(r2(1L)._2 === Seq(t(2), t(5), t(6)).map(_.getTime * 1000L))
      // streaming ≡ batch over the full logical input, per user
      val logical = b1 :+ Ev(4, t(2), 1, "view", 0, "{}")
      assert(r2.map { case (u, (s, _)) => u -> s } === batchStages(logical))
      // pure replay of everything: no reading may move
      src.addData((logical :+ Ev(1, t(5), 1, "click", 0, "{}")): _*)
      q.processAllAvailable()
      assert(latest("funnel_mon") === r2, "replay moved a reading")
    } finally q.stop()
  }

  test("funnelMonitor: conversion window gates a step exactly as in batch") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.funnelMonitor(src.toDF(), Seq("view", "click"),
        Some(3600L * 1000000)).writeStream
      .format("memory").queryName("funnel_win").outputMode("update").start()
    try {
      src.addData(
        Ev(1, t(1), 1, "view", 0, "{}"),
        Ev(2, t(3), 1, "click", 0, "{}"),   // 2h after view: outside 1h window
        Ev(3, t(1), 2, "view", 0, "{}"),
        Ev(4, t(1, 30), 2, "click", 0, "{}")) // 30 min: inside
      q.processAllAvailable()
      val out = spark.table("funnel_win")
        .groupBy("user_id").agg(max("stage").as("stage"))
        .as[(Long, Long)].collect().toMap
      assert(out === Map(1L -> 1L, 2L -> 2L))
    } finally q.stop()
  }

  test("rateMonitor: latest-bucket reading equals the batch q145 row; late old-bucket events correct the baseline") {
    implicit val sqlCtx = spark.sqlContext
    // type 'a': hours 0..7 at 2 events each, hour 8 spikes to 9 events
    def burst(h: Int, n: Int, idBase: Long): Seq[Ev] =
      (1 to n).map(i => Ev(idBase + i, t(h, 5), i.toLong, "a", 0, "{}"))
    val src = MemoryStream[Ev]
    val q = EventStream.rateMonitor(src.toDF(), trailing = 24, minTrailing = 6)
      .writeStream.format("memory").queryName("rate_monitor")
      .outputMode("update").start()
    def latestReading: (Long, Long, Long, Long, Long, Long) =
      spark.table("rate_monitor").filter(col("event_type") === "a")
        .orderBy(col("bucket").desc)
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().head match { case (_, b, n, w, num, den, an) => (b, n, w, num, den, an) }
    def batchRow(evs: Seq[Ev], bucket: Long): (Long, Long, Long, Long, Long, Long) =
      evs.toDF()
        .transform(graft.ops.EventAnalytics.rateAnomalies("ts", "event_type"))
        .filter(col("event_type") === "a" && col("bucket") === bucket)
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().head match { case (_, b, n, w, num, den, an) => (b, n, w, num, den, an) }
    try {
      // batch 1: hours 0..6 steady, hour 8 spike — hour 7 MISSING (late)
      val b1 = (0 to 6).flatMap(h => burst(h, 2, h * 100L)) ++ burst(8, 9, 900L)
      src.addData(b1: _*)
      q.processAllAvailable()
      val r1 = latestReading
      assert(r1 === batchRow(b1, r1._1), "streaming ≡ batch on the prefix")
      assert(r1._6 === 1L, "9 vs steady 2s must flag")
      // batch 2: hour 7 arrives LATE with an extreme count (20 events):
      // it enters the spike's trailing baseline retroactively — variance
      // explodes, so hour 8 no longer flags; next trigger's reading for
      // bucket 8 must equal the batch over ALL delivered rows
      val late = burst(7, 20, 700L)
      src.addData(late: _*)
      q.processAllAvailable()
      val all = b1 ++ late
      val r2 = spark.table("rate_monitor").filter(col("event_type") === "a")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
        .filter(r => r._2 == r1._1).maxBy(_._4) // bucket 8, post-correction row
      val expect = batchRow(all, r1._1)
      assert((r2._2, r2._3, r2._4, r2._5, r2._6, r2._7) === expect,
        "late old-bucket data must retroactively correct the baseline")
      assert(r2._7 === 0L, "exploded variance: spike no longer 3σ")
    } finally q.stop()
  }

  test("statusMonitor: reading equals the batch q146 current row through out-of-order splits, extensions, and replay") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.statusMonitor(src.toDF())
      .writeStream.format("memory").queryName("status_monitor")
      .outputMode("update").start()
    def latest: (String, Long, Long) =
      spark.table("status_monitor").filter(col("user_id") === 1L)
        .as[(Long, String, Long, Long)].collect().last match {
        case (_, st, vf, ni) => (st, vf, ni)
      }
    def batchCurrent(evs: Seq[Ev]): (String, Long, Long) = {
      val iv = evs.toDF().transform(graft.ops.EventAnalytics
          .statusIntervals("user_id", "ts", "event_type", "event_id"))
        .filter(col("user_id") === 1L)
        .as[(Long, String, Long, Option[Long], Long)].collect()
      val cur = iv.find(_._5 == 1L).get
      (cur._2, cur._3, iv.length.toLong)
    }
    try {
      // delivered in order: up@2h, up@6h → one interval, current run
      // starts at its CHANGE (2h)
      val b1 = Seq(Ev(1, t(2), 1, "up", 0, "{}"), Ev(2, t(6), 1, "up", 0, "{}"))
      src.addData(b1: _*)
      q.processAllAvailable()
      assert(latest === batchCurrent(b1))
      assert(latest._3 === 1L)
      // a LATE down@4h splits the run: history becomes up,down,up —
      // valid_from must move FORWARD to 6h, intervals to 3
      val b2 = b1 :+ Ev(3, t(4), 1, "down", 0, "{}")
      src.addData(b2.last)
      q.processAllAvailable()
      assert(latest === batchCurrent(b2))
      assert(latest === (("up", t(6).getTime * 1000L, 3L)),
        "valid_from must move FORWARD to the split run's head (6h)")
      // a LATE up@5h extends the current run BACKWARDS past 6h to 5h
      val b3 = b2 :+ Ev(4, t(5), 1, "up", 0, "{}")
      src.addData(b3.last)
      q.processAllAvailable()
      assert(latest === batchCurrent(b3))
      // at-least-once replay of an old event cannot move the reading
      src.addData(b1.head)
      q.processAllAvailable()
      assert(latest === batchCurrent(b3), "replay must be absorbed")
    } finally q.stop()
  }

  test("jdbcServingSink: live Derby serving store survives replay and out-of-order without regressing") {
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftserve;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute("DROP TABLE \"events_serve\"")
    catch { case _: java.sql.SQLException => () }
    conn.createStatement().execute(
      """CREATE TABLE "events_serve" (
        |  "user_id" BIGINT NOT NULL,
        |  "event_type" VARCHAR(20) NOT NULL,
        |  "value" DOUBLE,
        |  "ver" BIGINT,
        |  PRIMARY KEY ("user_id", "event_type"))""".stripMargin)
    conn.close()
    val factory: () => java.sql.Connection = {
      val u = url
      () => java.sql.DriverManager.getConnection(u)
    }
    def served: Map[(Long, String), (Double, Long)] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT * FROM \"events_serve\"")
        val out = Map.newBuilder[(Long, String), (Double, Long)]
        while (rs.next())
          out += ((rs.getLong(1), rs.getString(2)) -> ((rs.getDouble(3), rs.getLong(4))))
        out.result()
      } finally c.close()
    }
    val src = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("serve_ckpt").toString
    val q = EventStream.jdbcServingSink(src.toDF(), "events_serve", factory, ckpt).start()
    try {
      val usV = (h: Int) => t(h).getTime * 1000L
      src.addData(Ev(1, t(2), 1, "click", 10.0, "{}"), Ev(2, t(3), 1, "click", 20.0, "{}"))
      q.processAllAvailable()
      assert(served === Map((1L, "click") -> ((20.0, usV(3)))),
        "within-batch LWW serves only the latest cell")
      // out-of-order OLDER event in a later batch: must not regress
      src.addData(Ev(3, t(1), 1, "click", 99.0, "{}"))
      q.processAllAvailable()
      assert(served === Map((1L, "click") -> ((20.0, usV(3)))))
      // at-least-once replay of the first delivery: idempotent
      src.addData(Ev(2, t(3), 1, "click", 20.0, "{}"))
      q.processAllAvailable()
      assert(served === Map((1L, "click") -> ((20.0, usV(3)))))
      // genuine progress still lands, and a new key inserts
      src.addData(Ev(4, t(5), 1, "click", 30.0, "{}"), Ev(5, t(5), 2, "view", 7.0, "{}"))
      q.processAllAvailable()
      assert(served === Map(
        (1L, "click") -> ((30.0, usV(5))),
        (2L, "view") -> ((7.0, usV(5)))))
    } finally q.stop()
  }
}
