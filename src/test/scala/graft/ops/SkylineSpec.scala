package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The bucketed one-Exchange skyline must equal the O(n²) dominance
  * definition on arbitrary inputs, for any bucket count (the oracle in
  * the driver gate checks the same law against DuckDB's NOT EXISTS at
  * sf0.01; this pins it on adversarial shapes — duplicates, ties on one
  * axis, negative values, single-bucket and bucket-per-value layouts).
  * Raw Gen with fixed seeds — the scalatest/scalacheck bridge isn't on
  * the offline classpath (MergePropertySpec pattern). */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter(r => !rows.exists(o =>
      o._2 <= r._2 && o._3 >= r._3 &&
        (o._2 < r._2 || o._3 > r._3))).toSet

  private val rowsGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    xs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    ys <- Gen.listOfN(n, Gen.choose(-50L, 50L))
  } yield xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }

  test("frontier2d equals the O(n²) dominance definition on arbitrary inputs, any nBuckets") {
    for (seed <- 1 to 8; nBuckets <- Seq(1, 3, 64)) {
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val got = Skyline.frontier2d(
          rows.toDF("id", "x", "y"), "x", "y", nBuckets)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === brute(rows),
        s"seed=$seed nBuckets=$nBuckets rows=$rows")
    }
  }

  test("rows tied on both axes survive together; strict better on one axis kills") {
    val rows = Seq((1L, 10L, 5L), (2L, 10L, 5L), // exact ties: both stay
      (3L, 10L, 6L), // dominates 1,2 (same x, better y)
      (4L, 9L, 6L), // dominates 3 (better x, same y)
      (5L, 20L, 7L)) // survives: best y overall
    val got = Skyline.frontier2d(rows.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((4L, 9L, 6L), (5L, 20L, 7L)))
    val ties = Seq((1L, 3L, 3L), (2L, 3L, 3L))
    val gotTies = Skyline.frontier2d(ties.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotTies === ties.toSet)
  }

  test("idempotence: the frontier of a frontier is itself") {
    val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(99L))
    val once = Skyline.frontier2d(rows.toDF("id", "x", "y"), "x", "y")
    val twice = Skyline.frontier2d(once, "x", "y")
    assert(once.as[(Long, Long, Long)].collect().toSet ===
      twice.as[(Long, Long, Long)].collect().toSet)
  }

  test("frontier2dPerGroup equals the per-group brute force; groups are independent") {
    for (seed <- 1 to 5) {
      val a = rowsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val b = rowsGen.pureApply(Gen.Parameters.default, Seed(seed + 50L))
      val rows = a.map { case (i, x, y) => (i, "ga", x, y) } ++
        b.map { case (i, x, y) => (i, "gb", x, y) }
      val got = Skyline.frontier2dPerGroup(
          rows.toDF("id", "g", "x", "y"), Seq("g"), "x", "y", nBuckets = 7)
        .as[(String, Long, Long, Long)].collect()
        .map { case (g, i, x, y) => (i, g, x, y) }.toSet
      val expect =
        brute(a).map { case (i, x, y) => (i, "ga", x, y) } ++
          brute(b).map { case (i, x, y) => (i, "gb", x, y) }
      assert(got === expect, s"seed=$seed")
    }
    // independence made concrete: a row dominated globally survives as
    // its own group's frontier
    val rows = Seq((1L, "big", 5L, 100L), (2L, "small", 5L, 1L))
    val got = Skyline.frontier2dPerGroup(
        rows.toDF("id", "g", "x", "y"), Seq("g"), "x", "y")
      .as[(String, Long, Long, Long)].collect().map(_._2).toSet
    assert(got === Set(1L, 2L))
    assert(Skyline.frontier2d(rows.toDF("id", "g", "x", "y"), "x", "y")
      .as[(Long, String, Long, Long)].collect().map(_._1).toSet === Set(1L))
  }
}
