package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private case class Audit(qi1: String, qi2: Long, classSize: Long,
                           nSensitive: Long, kOk: Long, lOk: Long,
                           totalRows: Long, atRiskRows: Long, riskBp: Long)

  private def run(rows: Seq[(String, Long, String)], k: Int, l: Int = 2) =
    Privacy.kAnonymity(rows.toDF("qi1", "qi2", "sens").repartition(7),
        Seq("qi1", "qi2"), "sens", k = k, l = l)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
      .map(t => Audit(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9))

  test("kAnonymity equals the brute-force class audit on arbitrary generated rows") {
    val gen = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.oneOf("a", "b", "c"), Gen.choose(0L, 4L),
        Gen.oneOf("en", "de", "fr")))
    } yield rows
    for (seed <- 1 to 6) {
      val rows = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val k = 3
      val ref = rows.groupBy(r => (r._1, r._2)).map { case (qi, rs) =>
        qi -> (rs.size.toLong, rs.map(_._3).distinct.size.toLong)
      }
      val atRisk = ref.values.collect { case (sz, _) if sz < k => sz }.sum
      val total = rows.size.toLong
      val got = run(rows, k)
      assert(got.size === ref.size, s"seed=$seed")
      got.foreach { a =>
        val (sz, ns) = ref((a.qi1, a.qi2))
        assert(a.classSize === sz && a.nSensitive === ns, s"seed=$seed ${a.qi1}/${a.qi2}")
        assert(a.kOk === (if (sz >= k) 1L else 0L), s"seed=$seed")
        assert(a.lOk === (if (ns >= 2) 1L else 0L), s"seed=$seed")
        assert(a.totalRows === total && a.atRiskRows === atRisk, s"seed=$seed")
        assert(a.riskBp === atRisk * 10000 / total, s"seed=$seed")
      }
    }
  }

  test("kAnonymity closed forms: all-unique QIs = full risk; one big class = none") {
    val unique = (1L to 10L).map(i => (s"u$i", i, "en"))
    val u = run(unique, k = 5)
    assert(u.forall(a => a.classSize == 1L && a.kOk == 0L))
    assert(u.head.atRiskRows === 10L && u.head.riskBp === 10000L)

    val one = (1L to 10L).map(i => ("same", 0L, if (i % 2 == 0) "en" else "de"))
    val o = run(one, k = 5)
    assert(o.size === 1)
    assert(o.head.classSize === 10L && o.head.kOk === 1L && o.head.lOk === 1L)
    assert(o.head.atRiskRows === 0L && o.head.riskBp === 0L)
  }

  test("kAnonymity flags homogeneous classes: large but single-sensitive fails l, not k") {
    val rows = (1L to 8L).map(_ => ("cls", 0L, "en")) ++
      (1L to 8L).map(i => ("div", 0L, if (i % 2 == 0) "en" else "de"))
    val got = run(rows, k = 5).map(a => a.qi1 -> a).toMap
    assert(got("cls").kOk === 1L && got("cls").lOk === 0L,
      "size passes, homogeneity leaks the sensitive value")
    assert(got("div").kOk === 1L && got("div").lOk === 1L)
    assert(got("cls").riskBp === 0L, "k-risk counts only small classes")
  }
}
