package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized equivalence: the union-and-carry-forward as-of join must
  * agree with a naive per-row reference (latest right row with
  * rightTs <= leftTs per key) on arbitrary keyed event sets — including
  * duplicate timestamps, keys with no right rows, and right-only keys.
  * (Raw ScalaCheck Gen with fixed seeds — the scalatest/scalacheck
  * bridge isn't on the offline classpath.)
  */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val eventsGen = for {
    nLeft <- Gen.choose(0, 25)
    nRight <- Gen.choose(0, 25)
    leftRows <- Gen.listOfN(nLeft, for {
      k <- Gen.choose(0L, 3L); ts <- Gen.choose(0L, 20L)
    } yield (k, ts))
    rightRows <- Gen.listOfN(nRight, for {
      k <- Gen.choose(0L, 4L); ts <- Gen.choose(0L, 20L)
      v <- Gen.choose(0, 1000).map(_.toDouble)
    } yield (k, ts, v))
  } yield (leftRows, rightRows)

  test("property: as-of join ≡ naive per-row latest-at-or-before reference") {
    (1 to 12).foreach { seed =>
      val (leftRows, rightRows) =
        eventsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      // distinct left ids so rows are identifiable; dedupe identical
      // (k, ts) right rows (the operator's carry among exact ties is
      // order-dependent, which real feeds disambiguate with a version)
      val left = leftRows.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val right = rightRows.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq

      val out = AsOfJoin.join(
          left.toDF("user_id", "ts", "event_id"),
          right.toDF("user_id", "ts", "v"),
          Seq("user_id"), "ts", Seq("v"))
        .select("event_id", "matched_v")
        .as[(Long, Option[Double])].collect().toMap

      val expected = left.map { case (k, ts, id) =>
        val candidates = right.filter(r => r._1 == k && r._2 <= ts)
        id -> (if (candidates.isEmpty) None else Some(candidates.maxBy(_._2)._3))
      }.toMap

      assert(out === expected, s"seed=$seed")

      // the hot-key bucketed variant must satisfy the same reference;
      // bucket width 7 over ts 0..20 forces cross-bucket carries
      val bucketed = AsOfJoin.join(
          left.toDF("user_id", "ts", "event_id"),
          right.toDF("user_id", "ts", "v"),
          Seq("user_id"), "ts", Seq("v"),
          timeBucket = Some(ts =>
            org.apache.spark.sql.functions.floor(
              ts / org.apache.spark.sql.functions.lit(7L))))
        .select("event_id", "matched_v")
        .as[(Long, Option[Double])].collect().toMap
      assert(bucketed === expected, s"bucketed seed=$seed")
    }
  }
}
