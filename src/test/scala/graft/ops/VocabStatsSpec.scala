package graft.ops

import graft.SparkSpec

/** Zipf fit (q148): closed-form integer least-squares on a two-rank
  * corpus, slope recovery on designed power-law corpora (α=1 vs α=2),
  * per-source independence, the no-fit NULL edge, and partition
  * invariance. */
class VocabStatsSpec extends SparkSpec {
  import spark.implicits._

  private def powerLawText(c0: Int, alpha: Int, ranks: Int): String =
    (1 to ranks).flatMap { r =>
      val c = math.max(c0 / math.pow(r, alpha).toInt, 1)
      Seq.fill(c)(f"t$r%02d")
    }.mkString(" ")

  private def fit(rows: Seq[(String, String)], parts: Int = 1)
      : Map[String, (Long, Long, Long, Option[Long])] =
    rows.toDF("source", "text").repartition(parts)
      .transform(VocabStats.zipfSlopes("source", "text"))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("closed form on two ranks: exact quantized moments and the floor-division slope") {
    // counts a:4, b:2 → (x, y) = (0, 13863), (6931, 6931)
    val out = fit(Seq(("s", "a a a a b b")))("s")
    assert(out === ((2L, -48045692L, 48038761L, Some(-10001L))))
  }

  test("recovers the exponent: α=1 lands near −10⁴, α=2 near −2·10⁴") {
    val out = fit(Seq(
      ("zipf1", powerLawText(1200, 1, 12)),
      ("zipf2", powerLawText(1200, 2, 10))))
    val s1 = out("zipf1")._4.get
    val s2 = out("zipf2")._4.get
    assert(s1 > -10300 && s1 < -9700, s"alpha=1 slope $s1")
    assert(s2 > -20600 && s2 < -19400, s"alpha=2 slope $s2")
  }

  test("sources fit independently; a single-rank source has no fit (NULL)") {
    val a = ("a", "x x x y")
    val b = ("b", "u u v v v v w")
    val lone = ("lone", "only only only")
    val together = fit(Seq(a, b, lone))
    assert(together("a") === fit(Seq(a))("a"))
    assert(together("b") === fit(Seq(b))("b"))
    assert(together("lone")._1 === 1L)
    assert(together("lone")._3 === 0L)       // den = 0
    assert(together("lone")._4 === None)     // no slope
  }

  test("partition count cannot move the fit") {
    val rows = Seq(
      ("p", powerLawText(500, 1, 9)),
      ("q", "m m m n n o"),
      ("p", "extra words extra m"))
    assert(fit(rows, parts = 1) === fit(rows, parts = 8))
  }
}
