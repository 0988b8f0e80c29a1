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

  test("scd2History lifecycle matrix: stable, edit, delete, reappear, late add, revert") {
    val snaps = Seq(
      // (version, id, value)
      (0L, 1L, "stable"), (1L, 1L, "stable"), (2L, 1L, "stable"),
      (0L, 2L, "v0"), (1L, 2L, "v1"), (2L, 2L, "v1"),        // edit at v1
      (0L, 3L, "gone"),                                       // deleted at v1
      (0L, 4L, "x"), (2L, 4L, "x"),                           // delete + reappear
      (1L, 5L, "late"), (2L, 5L, "late"),                     // appears at v1
      (0L, 6L, "a"), (1L, 6L, "b"), (2L, 6L, "a"))            // revert at v2
      .toDF("version", "doc_id", "text")
    val out = Merge.scd2History(snaps, "version", "doc_id", "text")
      .as[(Long, String, Long, Option[Long])].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3, r._4)).sortBy(_._2).toSeq }
    assert(out(1L) === Seq(("stable", 0L, None)))
    assert(out(2L) === Seq(("v0", 0L, Some(0L)), ("v1", 1L, None)))
    assert(out(3L) === Seq(("gone", 0L, Some(0L))))
    assert(out(4L) === Seq(("x", 0L, Some(0L)), ("x", 2L, None)),
      "reappearance opens a NEW interval — the gap is real history")
    assert(out(5L) === Seq(("late", 1L, None)))
    assert(out(6L) === Seq(("a", 0L, Some(0L)), ("b", 1L, Some(1L)),
      ("a", 2L, None)), "a revert is a third interval, not a merge")
  }

  test("scd2History inverts: every snapshot reconstructs exactly from the intervals") {
    Seq(5, 23, 47, 79, 103, 131).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = for {
        v <- 0L to 3L; id <- 0L until 15L
        if rnd.nextDouble() < 0.7 // presence is random per version
      } yield (v, id, s"val${rnd.nextInt(3)}")
      val out = Merge.scd2History(rows.toDF("version", "doc_id", "text"),
          "version", "doc_id", "text")
        .as[(Long, String, Long, Option[Long])].collect()
      // intervals per doc never overlap
      out.groupBy(_._1).values.foreach { ivs =>
        val sorted = ivs.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.isDefined && a._4.get < b._3, s"overlap: $a $b")
          case _ =>
        }
      }
      // reconstruction: state at every version == the input snapshot
      (0L to 3L).foreach { v =>
        val rebuilt = out.filter(r => r._3 <= v && r._4.forall(_ >= v))
          .map(r => r._1 -> r._2).toMap
        val want = rows.filter(_._1 == v).map(r => r._2 -> r._3).toMap
        assert(rebuilt === want, s"seed=$seed version=$v")
      }
    }
  }

  test("threeWayMerge covers the full reconciliation matrix") {
    // one id per cell of the matrix
    val base = Seq(
      1L -> "same", 2L -> "oe", 3L -> "te", 4L -> "bs", 5L -> "bd",
      6L -> "od", 7L -> "td", 8L -> "bothdel", 9L -> "delVedit",
      10L -> "editVdel").toDF("id", "v")
    val ours = Seq(
      1L -> "same", 2L -> "oe2", 3L -> "te", 4L -> "agree", 5L -> "X",
      /* 6 deleted */ 7L -> "td", /* 8 deleted */ /* 9 deleted */
      10L -> "edited", 11L -> "oadd", 13L -> "sameadd", 14L -> "addA")
      .toDF("id", "v")
    val theirs = Seq(
      1L -> "same", 2L -> "oe", 3L -> "te2", 4L -> "agree", 5L -> "Y",
      6L -> "od", /* 7 deleted */ /* 8 deleted */ 9L -> "edited",
      /* 10 deleted */ 12L -> "tadd", 13L -> "sameadd", 14L -> "addB")
      .toDF("id", "v")
    val out = Merge.threeWayMerge("id", "v")(base, ours, theirs)
      .as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === (("base", Some("same"))))
    assert(out(2L) === (("ours", Some("oe2"))))
    assert(out(3L) === (("theirs", Some("te2"))))
    assert(out(4L) === (("both", Some("agree"))), "agreeing edits merge")
    assert(out(5L) === (("conflict", None)), "edit vs edit, different")
    assert(out(6L) === (("ours", None)), "clean delete taken (merged null)")
    assert(out(7L) === (("theirs", None)))
    assert(out(8L) === (("both", None)), "agreeing deletes merge")
    assert(out(9L) === (("conflict", None)), "delete vs edit is a conflict")
    assert(out(10L) === (("conflict", None)), "edit vs delete is a conflict")
    assert(out(11L) === (("ours", Some("oadd"))), "one-side add")
    assert(out(12L) === (("theirs", Some("tadd"))))
    assert(out(13L) === (("both", Some("sameadd"))), "agreeing adds merge")
    assert(out(14L) === (("conflict", None)), "add-add collision conflicts")
    assert(out.size === 14)
    // swapping ours/theirs swaps those labels and nothing else
    val swapped = Merge.threeWayMerge("id", "v")(base, theirs, ours)
      .as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (id, (res, merged)) =>
      val want = res match {
        case "ours" => "theirs"
        case "theirs" => "ours"
        case other => other
      }
      assert(swapped(id) === ((want, merged)), s"id=$id")
    }
  }
}
