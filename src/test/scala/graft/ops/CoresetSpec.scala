package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Greedy k-center must match a plain-Scala farthest-point traversal
  * with the same tie-breaks on arbitrary generated vector sets, and
  * the emitted cover-radius sequence must be non-increasing from round
  * 2 on (each pick can only shrink the farthest distance). */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Same seed rule (max squared norm), same greedy step, same
    * smallest-id tie-break. */
  private def ref(vecs: Seq[(Long, Array[Double])], k: Int): Seq[(Long, Double)] = {
    val n2 = vecs.map { case (id, v) => (id, v, dot(v, v)) }
    var centers = List.empty[(Array[Double], Double)]
    var out = Vector.empty[(Long, Double)]
    for (_ <- 1 to k) {
      val scored = n2.map { case (id, v, nn) =>
        val dmin =
          if (centers.isEmpty) nn
          else centers.map { case (cv, cn2) => nn - 2.0 * dot(v, cv) + cn2 }.min
        (id, v, nn, dmin)
      }
      val best = scored.minBy { case (id, _, _, d) => (-d, id) }
      out :+= ((best._1, best._4))
      centers :+= ((best._2, best._3))
    }
    out
  }

  private val vecsGen: Gen[Seq[(Long, Array[Float])]] = for {
    n <- Gen.choose(2, 30)
    vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-100, 100)))
  } yield vs.zipWithIndex.map { case (v, i) =>
    (i.toLong, v.map(x => x / 10.0f).toArray)
  }

  test("kCenterGreedy matches the plain-Scala farthest-point traversal on arbitrary vector sets") {
    for (seed <- 1 to 5) {
      val vecs = vecsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val k = math.min(4, vecs.size)
      val got = Coreset.kCenterGreedy(
          vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      val expect = ref(vecs.map { case (id, v) => (id, v.map(_.toDouble)) }, k)
      assert(got.map(_._2) === expect.map(_._1), s"seed=$seed picks differ")
      got.zip(expect).foreach { case ((_, _, sc), (_, d)) =>
        assert(math.abs(sc - d) <= 1.1e-4, s"seed=$seed score $sc vs $d")
      }
    }
  }

  test("cover radius is non-increasing from round 2; duplicates of a center are never re-picked") {
    val vecs = Seq(
      (10L, Array(5f, 0f, 0f, 0f)),
      (11L, Array(5f, 0f, 0f, 0f)), // exact duplicate of the seed
      (12L, Array(-5f, 0f, 0f, 0f)),
      (13L, Array(0f, 4f, 0f, 0f)),
      (14L, Array(0f, -4f, 0f, 0f)))
    val got = Coreset.kCenterGreedy(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val radii = got.drop(1).map(_._3)
    assert(radii === radii.sorted.reverse, s"radii not non-increasing: $radii")
    assert(!got.map(_._2).contains(11L), "duplicate of selected center picked")
    assert(got.map(_._2).distinct.size === 4)
  }
}
