package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated laws for the SCD2 build (q146): distributed
  * statusIntervals ≡ a plain-Scala reference on arbitrary event logs
  * (duplicate timestamps, repeated statuses, multi-user interleaving),
  * and the structural chaining/current-row invariants. Raw Gen with
  * fixed seeds — the MergePropertySpec pattern. */
class EventAnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(evs: Seq[(Long, Long, Long, String)])
      : Set[(Long, String, Long, Option[Long], Long)] =
    evs.groupBy(_._2).flatMap { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      val changes = ordered.foldLeft(Vector.empty[(Long, String)]) {
        (acc, r) =>
          if (acc.nonEmpty && acc.last._2 == r._4) acc
          else acc :+ (r._3 -> r._4)
      }
      changes.zipWithIndex.map { case ((us, st), i) =>
        val to = if (i + 1 < changes.size) Some(changes(i + 1)._1) else None
        (user, st, us, to, if (to.isEmpty) 1L else 0L)
      }
    }.toSet

  private val logGen: Gen[Seq[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.sequence[Seq[(Long, Long, Long, String)], (Long, Long, Long, String)](
      (1 to n).map { id =>
        for {
          user <- Gen.choose(1L, 4L)
          us <- Gen.choose(0L, 9L).map(_ * 1000000L) // collisions likely
          st <- Gen.oneOf("a", "b", "c")
        } yield (id.toLong, user, us, st)
      })
  } yield rows

  test("property: statusIntervals equals the reference on arbitrary logs; chaining + current-row invariants") {
    (1 to 6).foreach { seed =>
      val evs = logGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = evs.toDF("event_id", "user_id", "us", "event_type")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("us")).as("ts"), col("event_type"))
        .repartition(1 + seed % 5)
      val got = df.transform(EventAnalytics.statusIntervals(
          "user_id", "ts", "event_type", "event_id"))
        .as[(Long, String, Long, Option[Long], Long)].collect().toSet
      assert(got === reference(evs), s"seed=$seed")
      // structural laws: per user exactly one current row and the
      // intervals chain gaplessly. Equal-instant changes produce
      // zero-length intervals sharing a valid_from, so the chain order
      // is (from, to) — any permutation of identical zero-length rows
      // chains equivalently.
      got.groupBy(_._1).values.foreach { iv =>
        val s = iv.toSeq.sortBy(r => (r._3, r._4.getOrElse(Long.MaxValue)))
        assert(s.count(_._5 == 1L) === 1)
        assert(s.last._5 === 1L && s.last._4.isEmpty)
        s.sliding(2).foreach {
          case Seq(a, b) => assert(a._4.contains(b._3), s"$a !-> $b")
          case _ =>
        }
      }
    }
  }
}
