package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def refKs(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    val vals = (a ++ b).distinct.sorted
    val na = a.size.toLong; val nb = b.size.toLong
    val dNum = vals.map(v =>
      math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)).max
    (dNum, na * nb)
  }

  test("ksDrift equals the exact two-sample KS fraction on arbitrary samples") {
    val gen = for {
      na <- Gen.choose(1, 40); nb <- Gen.choose(1, 40)
      a <- Gen.listOfN(na, Gen.choose(0L, 30L))
      b <- Gen.listOfN(nb, Gen.choose(0L, 30L))
    } yield (a, b)
    for (seed <- 1 to 6) {
      val (a, b) = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = (a.map(v => (v, "A")) ++ b.map(v => (v, "B")))
        .toDF("v", "g").repartition(7)
      val got = Stats.ksDrift(df, "v", col("g") === "A", col("g") === "B")
        .as[(Long, Long, Long, Long, Long)].collect()(0)
      val (dNum, dDen) = refKs(a, b)
      assert((got._1, got._2, got._3, got._4) ===
        ((a.size.toLong, b.size.toLong, dNum, dDen)), s"seed=$seed")
      assert(got._5 === dNum * 10000 / dDen)
    }
  }

  test("ksDrift: identical samples give D=0; disjoint supports give D=1 (10000 bp)") {
    val same = (1L to 50L).flatMap(v => Seq((v, "A"), (v, "B"))).toDF("v", "g")
    val s = Stats.ksDrift(same, "v", col("g") === "A", col("g") === "B")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(s._3 === 0L && s._5 === 0L)
    val disj = ((1L to 20L).map(v => (v, "A")) ++
      (100L to 130L).map(v => (v, "B"))).toDF("v", "g")
    val d = Stats.ksDrift(disj, "v", col("g") === "A", col("g") === "B")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(d._3 === d._4 && d._5 === 10000L)
  }

  test("poissonBootstrapCi matches a plain-Scala replica-by-replica reference") {
    def md5u(id: Long, b: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(h, 16).toDouble / 281474976710656.0
    }
    def pois(u: Double): Long =
      if (u < 0.36787944117144233) 0L else if (u < 0.7357588823428847) 1L
      else if (u < 0.9196986029286058) 2L else if (u < 0.9810118431238462) 3L
      else if (u < 0.9963401531726563) 4L else 5L
    val docs = (1L to 80L).map(i => (i, 10L + (i * 7) % 50))
    val bN = 50
    val means = (0 until bN).flatMap { b =>
      val ws = docs.map { case (id, x) => (pois(md5u(id, b)), x) }
      val n = ws.map(_._1).sum
      if (n > 0) Some(ws.map { case (w, x) => w * x }.sum * 1.0 / n) else None
    }.sorted
    val pm = docs.map(_._2).sum * 1.0 / docs.size
    def r4(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.poissonBootstrapCi(
        docs.toDF("doc_id", "n_chars").repartition(5), "doc_id", "n_chars",
        b = bN, loRank = 2, hiRank = bN - 1)
      .as[(Double, Double, Double, Long)].collect()(0)
    assert(got._4 === means.size.toLong)
    assert(got._1 === r4(pm))
    assert(got._2 === r4(means(1)))          // rank 2, 1-indexed
    assert(got._3 === r4(means(bN - 2)))     // rank bN-1
    assert(got._2 <= got._1 && got._1 <= got._3,
      "CI brackets the point estimate on this well-behaved sample")
  }

  test("ksFromHistograms ≡ the DataFrame ksDrift on arbitrary histograms (the streaming monitor's contract)") {
    val gen = for {
      a <- Gen.mapOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(1L, 5L)))
      b <- Gen.mapOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(1L, 5L)))
      if a.nonEmpty && b.nonEmpty
    } yield (a, b)
    for (seed <- 1 to 6) {
      val (a, b) = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val rows = a.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)((v, "A")) } ++
        b.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)((v, "B")) }
      val fromDf = Stats.ksDrift(rows.toDF("v", "g"),
          "v", col("g") === "A", col("g") === "B")
        .as[(Long, Long, Long, Long, Long)].collect()(0)
      assert(Stats.ksFromHistograms(a, b) === fromDf, s"seed=$seed")
    }
    assert(Stats.ksFromHistograms(Map.empty, Map(1L -> 2L)) ===
      ((0L, 2L, 0L, 0L, 0L)))
  }

  test("poissonBootstrapCi is partition-invariant and deterministic") {
    val docs = (1L to 60L).map(i => (i, i % 23 + 5))
    def run(parts: Int) = Stats.poissonBootstrapCi(
        docs.toDF("doc_id", "n_chars").repartition(parts),
        "doc_id", "n_chars", b = 40, loRank = 2, hiRank = 39)
      .as[(Double, Double, Double, Long)].collect()(0)
    assert(run(1) === run(13))
  }

  // brute-force 2U: +2 per (pos > neg) pair, +1 per tied pair
  private def refAuc2U(xs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val pos = xs.filter(_._2 == 1L).map(_._1)
    val neg = xs.filter(_._2 == 0L).map(_._1)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    (pos.size.toLong, neg.size.toLong, num)
  }

  test("aucExact equals the brute-force pairwise Mann–Whitney on arbitrary tied samples") {
    val gen = for {
      n <- Gen.choose(2, 60)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(-5L, 5L), Gen.oneOf(0L, 1L)))
    } yield xs
    for (seed <- 1 to 6) {
      val xs = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val (np, nn, num) = refAuc2U(xs)
      val got = Stats.aucExact(xs.toDF("s", "y").repartition(7), "s", "y")
        .as[(Long, Long, Long, Long, Option[Long])].collect()(0)
      assert((got._1, got._2, got._3, got._4) === ((np, nn, num, 2 * np * nn)),
        s"seed=$seed")
      if (np > 0 && nn > 0)
        assert(got._5 === Some(num * 10000 / (2 * np * nn)), s"seed=$seed")
      else assert(got._5 === None, s"seed=$seed")
    }
  }

  test("prCurve equals the brute-force per-threshold confusion table on arbitrary tied samples") {
    val gen = for {
      n <- Gen.choose(2, 50)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(-4L, 4L), Gen.oneOf(0L, 1L)))
    } yield xs
    for (seed <- 1 to 6) {
      val xs = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val np = xs.count(_._2 == 1L).toLong
      val nn = xs.size - np
      val got = Stats.prCurve(xs.toDF("s", "y").repartition(7), "s", "y")
        .as[(Long, Long, Long, Long, Long, Long, Option[Long], Long)]
        .collect().toSeq.sortBy(_._1)
      assert(got.map(_._1) === xs.map(_._1).distinct.sorted, s"seed=$seed")
      got.foreach { case (t, tp, fp, fn, tn, prec, rec, f1) =>
        val tpR = xs.count(x => x._1 >= t && x._2 == 1L).toLong
        val fpR = xs.count(x => x._1 >= t && x._2 == 0L).toLong
        assert((tp, fp, fn, tn) === ((tpR, fpR, np - tpR, nn - fpR)),
          s"seed=$seed t=$t")
        assert(prec === tp * 10000 / (tp + fp), s"seed=$seed t=$t")
        if (np > 0) assert(rec === Some(tp * 10000 / np), s"seed=$seed")
        else assert(rec === None, s"seed=$seed")
        assert(f1 === 2 * tp * 10000 / (2 * tp + fp + fn), s"seed=$seed")
      }
    }
  }

  test("prCurve endpoints: the lowest threshold keeps everything (recall 10000)") {
    val xs = Seq((5L, 1L), (3L, 0L), (3L, 1L), (1L, 0L))
    val got = Stats.prCurve(xs.toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().toSeq.sortBy(_._1)
    val lowest = got.head
    assert(lowest._2 === 2L && lowest._3 === 2L && lowest._7 === Some(10000L))
    val highest = got.last
    assert(highest._1 === 5L && highest._2 === 1L && highest._3 === 0L &&
      highest._6 === 10000L, "top cut keeps only the top-scored positive")
  }

  test("corrExact equals the brute-force moment arithmetic on arbitrary integer pairs") {
    val gen = for {
      n <- Gen.choose(2, 60)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(-50L, 50L)))
    } yield xs
    for (seed <- 1 to 6) {
      val xs = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val n = BigInt(xs.size)
      val sx = xs.map(t => BigInt(t._1)).sum; val sy = xs.map(t => BigInt(t._2)).sum
      val sxx = xs.map(t => BigInt(t._1) * t._1).sum
      val syy = xs.map(t => BigInt(t._2) * t._2).sum
      val sxy = xs.map(t => BigInt(t._1) * t._2).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      val want: Option[Long] =
        if (dx == 0 || dy == 0) None
        else Some((if (num >= 0) (num * num * 10000) / (dx * dy)
                   else -((num * num * 10000) / (dx * dy))).toLong)
      val got = Stats.corrExact(xs.toDF("x", "y").repartition(7), "x", "y")
        .as[(Long, Long, Long, Long, Option[Long])].collect()(0)
      assert((got._1, got._2, got._3, got._4) ===
        ((n.toLong, num.toLong, dx.toLong, dy.toLong)), s"seed=$seed")
      assert(got._5 === want, s"seed=$seed")
    }
  }

  test("corrExact closed forms: affine = ±10000 bp; constant column = NULL") {
    def run(xs: Seq[(Long, Long)]) =
      Stats.corrExact(xs.toDF("x", "y"), "x", "y")
        .as[(Long, Long, Long, Long, Option[Long])].collect()(0)
    val up = (1L to 20L).map(i => (i, 2 * i + 3))
    assert(run(up)._5 === Some(10000L))
    val down = (1L to 20L).map(i => (i, 100L - i))
    assert(run(down)._5 === Some(-10000L))
    val const = (1L to 10L).map(i => (i, 7L))
    assert(run(const)._5 === None, "zero variance: r undefined, not 0")
  }

  private def refChi2(rows: Seq[(String, String)]): (Long, Long, Long, Long, Long, Option[Long]) = {
    val o = rows.groupBy(identity).map { case (k, v) => k -> BigInt(v.size) }
    val rs = rows.map(_._1).distinct; val cs = rows.map(_._2).distinct
    val rt = rs.map(r => r -> o.collect { case ((`r`, _), v) => v }.sum).toMap
    val ct = cs.map(c => c -> o.collect { case ((_, `c`), v) => v }.sum).toMap
    val n = BigInt(rows.size)
    val chi2 = (for (r <- rs; c <- cs) yield {
      val d = o.getOrElse((r, c), BigInt(0)) * n - rt(r) * ct(c)
      (d * d * 10000) / (rt(r) * ct(c) * n)
    }).sum
    val v2 = if (rs.size < 2 || cs.size < 2) None
      else Some((chi2 / (n * BigInt(math.min(rs.size, cs.size) - 1))).toLong)
    (n.toLong, rs.size.toLong, cs.size.toLong,
      (rs.size - 1).toLong * (cs.size - 1), chi2.toLong, v2)
  }

  test("chi2Homogeneity equals the brute-force grid arithmetic on arbitrary tables") {
    val gen = for {
      n <- Gen.choose(2, 80)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.oneOf("s1", "s2", "s3"), Gen.oneOf("en", "de", "fr", "pt")))
    } yield rows
    for (seed <- 1 to 6) {
      val rows = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val got = graft.ops.Staged.withStaged {
        Stats.chi2Homogeneity(rows.toDF("src", "lang").repartition(7),
            "src", "lang")
          .as[(Long, Long, Long, Long, Long, Option[Long])].collect()(0)
      }
      assert(got === refChi2(rows), s"seed=$seed")
    }
  }

  test("chi2Homogeneity closed forms: proportional rows = 0; diagonal association = V2 10000; 1-col NULL") {
    // identical distribution in both rows (x2 scale) -> every term 0
    val prop = Seq.fill(4)(("a", "en")) ++ Seq.fill(2)(("a", "de")) ++
      Seq.fill(8)(("b", "en")) ++ Seq.fill(4)(("b", "de"))
    val p = graft.ops.Staged.withStaged {
      Stats.chi2Homogeneity(prop.toDF("src", "lang"), "src", "lang")
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect()(0)
    }
    assert(p._5 === 0L && p._6 === Some(0L))
    // perfect association: 2x2 diagonal, equal counts -> V^2 = 1
    // (counts chosen so every cell divides exactly: d^2*10^4/(rt*ct*n)
    // = 25000 per cell; truncation-free, so the bound is attained)
    val diag = Seq("x", "y").flatMap(s => Seq.fill(5)((s, s.toUpperCase)))
    val dd = graft.ops.Staged.withStaged {
      Stats.chi2Homogeneity(diag.toDF("src", "lang"), "src", "lang")
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect()(0)
    }
    assert(dd._5 === 100000L && dd._6 === Some(10000L), s"got $dd")
    // single observed column: dof 0, V^2 undefined
    val one = Seq.fill(6)(("a", "en")) ++ Seq.fill(3)(("b", "en"))
    val o = graft.ops.Staged.withStaged {
      Stats.chi2Homogeneity(one.toDF("src", "lang"), "src", "lang")
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect()(0)
    }
    assert(o._4 === 0L && o._6 === None)
  }

  private def refRobust(xs: Seq[Long]): (Long, Long) = {
    def lowerMed(s: Seq[Long]): Long = s.sorted.apply((s.size - 1) / 2)
    val m = lowerMed(xs)
    (m, lowerMed(xs.map(x => math.abs(x - m))))
  }

  test("robustStats equals the sequential lower-median/MAD on arbitrary grouped values") {
    val gen = for {
      n <- Gen.choose(1, 60)
      xs <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 40L)))
    } yield xs
    for (seed <- 1 to 6) {
      val xs = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val got = graft.ops.Staged.withStaged {
        Stats.robustStats(xs.toDF("g", "v").repartition(7), "g", "v")
          .as[(String, Long, Long, Long)].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      }
      val want = xs.groupBy(_._1).map { case (g, vs) =>
        val (m, mad) = refRobust(vs.map(_._2))
        g -> ((vs.size.toLong, m, mad))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("robustStats: the median shrugs off an outlier the mean cannot") {
    val vals = Seq.fill(9)(100L) :+ 1000000L
    val rows = vals.map(("src", _))
    val got = graft.ops.Staged.withStaged {
      Stats.robustStats(rows.toDF("g", "v"), "g", "v")
        .as[(String, Long, Long, Long)].collect()(0)
    }
    assert(got === (("src", 10L, 100L, 0L)),
      "median 100, MAD 0 — the blob is invisible to the robust reading")
  }

  test("giniExact equals the classic rank formula on arbitrary non-negative values") {
    val gen = for {
      n <- Gen.choose(1, 60)
      xs <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield xs
    for (seed <- 1 to 6) {
      val xs = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val sorted = xs.sorted
      val n = BigInt(xs.size); val t = sorted.map(BigInt(_)).sum
      val s2 = sorted.zipWithIndex
        .map { case (x, i) => BigInt(2) * (i + 1) * x }.sum
      val want: Option[Long] =
        if (t == 0) None else Some(((s2 - (n + 1) * t) * 10000 / (n * t)).toLong)
      val got = Stats.giniExact(xs.toDF("v").repartition(7), "v")
        .as[(Long, Long, Long, Long, Option[Long])].collect()(0)
      assert((got._1, got._2) === ((n.toLong, t.toLong)), s"seed=$seed")
      assert(got._3 === (s2 - (n + 1) * t).toLong, s"seed=$seed")
      assert(got._5 === want, s"seed=$seed")
    }
  }

  test("giniExact closed forms: uniform = 0; one-holder = (n-1)/n; zero mass = NULL") {
    def run(xs: Seq[Long]) = Stats.giniExact(xs.toDF("v"), "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect()(0)
    assert(run(Seq.fill(10)(7L))._5 === Some(0L))
    // 9 zeros + one holder of everything: G = (n-1)/n = 0.9
    assert(run(Seq.fill(9)(0L) :+ 100L)._5 === Some(9000L))
    assert(run(Seq.fill(5)(0L))._5 === None, "zero total mass: undefined")
  }

  test("split-balance certificate discriminates: a length-biased split reads max drift, a mirrored one reads 0") {
    // deliberately biased: all short docs in train, all long in test
    val biased = ((1L to 30L).map(v => (v, "train")) ++
      (101L to 130L).map(v => (v, "test"))).toDF("n_chars", "split")
    val b = Stats.ksDrift(biased, "n_chars",
        col("split") === "train", col("split") === "test")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(b._5 === 10000L, "disjoint length supports = max imbalance")
    // mirrored: identical length multiset in both splits
    val fair = (1L to 30L).flatMap(v => Seq((v, "train"), (v, "test")))
      .toDF("n_chars", "split")
    val f = Stats.ksDrift(fair, "n_chars",
        col("split") === "train", col("split") === "test")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(f._5 === 0L)
  }

  test("aucExact closed forms: perfect separation 10000 bp, reversed 0, all-tied 5000") {
    def run(xs: Seq[(Long, Long)]) =
      Stats.aucExact(xs.toDF("s", "y"), "s", "y")
        .as[(Long, Long, Long, Long, Option[Long])].collect()(0)
    val perfect = (1L to 10L).map(s => (s + 100L, 1L)) ++
      (1L to 15L).map(s => (s, 0L))
    assert(run(perfect)._5 === Some(10000L))
    val reversed = perfect.map { case (s, y) => (s, 1L - y) }
    assert(run(reversed)._5 === Some(0L))
    val tied = (1L to 8L).map(_ => (7L, 1L)) ++ (1L to 9L).map(_ => (7L, 0L))
    assert(run(tied)._5 === Some(5000L))
    val oneClass = (1L to 5L).map(s => (s, 1L))
    assert(run(oneClass)._5 === None, "AUC undefined without both classes")
  }
}
