package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ZCurveSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala bit interleave: bit i of x → bit 2i, bit i of y →
    * bit 2i+1. */
  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue equals the bit-by-bit interleave on arbitrary 16-bit coordinates") {
    val gen = Gen.listOfN(200, for {
      x <- Gen.choose(0L, 65535L); y <- Gen.choose(0L, 65535L)
    } yield (x, y))
    val pts = gen.pureApply(Gen.Parameters.default, Seed(7L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZCurve.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === refZ(x, y), s"($x,$y)") }
    // corners pin the bit layout (x even bits, y odd)
    val corners = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (1L, 0L), (0L, 1L))
      .toDF("x", "y").select(ZCurve.zValue(col("x"), col("y"))).as[Long].collect()
    assert(corners === Array(0L, 1431655765L, 2863311530L, 4294967295L, 1L, 2L))
  }

  test("zValue is monotone in each coordinate with the other fixed") {
    val rows = (0L to 300L).flatMap(i => Seq((i, 37L), (37L, i)))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZCurve.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    val byY = got.filter(_._2 == 37L).sortBy(_._1).map(_._3)
    val byX = got.filter(_._1 == 37L).sortBy(_._2).map(_._3)
    assert(byY === byY.sorted && byX === byX.sorted)
  }

  test("scaleTo16: epoch-µs-sized spans land in [0, 65535] with no overflow; endpoints and constants behave") {
    val lo = 1704067200000000L // ~2024 epoch µs
    val hi = 1706659200000000L // +30 days
    val vals = Seq(lo, lo + 1, (lo + hi) / 2, hi - 1, hi)
    val got = vals.toDF("c")
      .withColumn("__lo", lit(lo)).withColumn("__hi", lit(hi))
      .select(ZCurve.scaleTo16("c", "__lo", "__hi").as("s"))
      .as[Long].collect()
    assert(got.forall(s => s >= 0L && s <= 65535L), got.toSeq)
    assert(got.head === 0L)
    assert(got.last >= 65534L) // hi maps to the top bucket
    assert(got.toSeq === got.toSeq.sorted) // monotone
    // constant column: hi = lo → everything is bucket 0 with no division blowup
    val const = Seq(5L, 5L).toDF("c")
      .withColumn("__lo", lit(5L)).withColumn("__hi", lit(5L))
      .select(ZCurve.scaleTo16("c", "__lo", "__hi").as("s"))
      .as[Long].collect()
    assert(const.toSeq === Seq(0L, 0L))
  }

  test("scaleTo16 stretches small spans across all 16 bits and shrinks giant spans without overflow") {
    // small span (300 users) must reach the TOP of 16-bit space —
    // otherwise the curve degrades to a single-dimension sort
    val small = Seq(0L, 150L, 300L).toDF("c")
      .withColumn("__lo", lit(0L)).withColumn("__hi", lit(300L))
      .select(ZCurve.scaleTo16("c", "__lo", "__hi").as("s"))
      .as[Long].collect()
    assert(small.toSeq === Seq(0L, 32767L, 65535L))
    // giant span (> the multiply threshold): width-division branch,
    // still in range, still monotone
    val hi = 2600000000000000L // 2.6e15 µs ≈ 82 years
    val giant = Seq(0L, hi / 2, hi).toDF("c")
      .withColumn("__lo", lit(0L)).withColumn("__hi", lit(hi))
      .select(ZCurve.scaleTo16("c", "__lo", "__hi").as("s"))
      .as[Long].collect()
    assert(giant.forall(s => s >= 0L && s <= 65535L), giant.toSeq)
    assert(giant.toSeq === giant.toSeq.sorted && giant.last >= 65534L)
  }
}
