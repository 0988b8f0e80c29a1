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

  // plain-Scala vocab growth: walk docs in id order, bucket read-offs
  private def refGrowth(docs: Seq[(Long, String)],
                        b: Long): Seq[(Long, Long, Long, Long)] = {
    val sorted = docs.sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    var nd = 0L; var nt = 0L
    sorted.groupBy(_._1 / b).toSeq.sortBy(_._1).map { case (bucket, ds) =>
      ds.sortBy(_._1).foreach { case (_, t) =>
        nd += 1
        val w = t.trim.split("\\s+").filter(_.nonEmpty)
        nt += w.length
        w.foreach(seen += _)
      }
      (bucket, nd, nt, seen.size.toLong)
    }
  }

  test("vocabGrowth equals the sequential prefix-distinct walk on generated corpora") {
    val gen = for {
      nd <- org.scalacheck.Gen.choose(1, 40)
      docs <- org.scalacheck.Gen.listOfN(nd,
        org.scalacheck.Gen.choose(0, 8).flatMap(len =>
          org.scalacheck.Gen.listOfN(len,
            org.scalacheck.Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
            .map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (seed <- 1 to 6) {
      val docs = gen.pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong))
      val got = graft.ops.Staged.withStaged {
        docs.toDF("doc_id", "text").repartition(5)
          .transform(VocabStats.vocabGrowth("doc_id", "text", 7))
          .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      }
      assert(got === refGrowth(docs, 7), s"seed=$seed")
    }
  }

  test("vocabGrowth: repetition flattens the curve; churn keeps it on the diagonal") {
    val rep = (0L until 20L).map(i => (i, "same three words"))
    val gotRep = graft.ops.Staged.withStaged {
      rep.toDF("doc_id", "text")
        .transform(VocabStats.vocabGrowth("doc_id", "text", 5))
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(gotRep.map(_._4) === Seq(3L, 3L, 3L, 3L),
      "vocab saturates in the first bucket")
    assert(gotRep.last._3 === 60L)
    val churn = (0L until 20L).map(i => (i, s"u$i v$i"))
    val gotChurn = graft.ops.Staged.withStaged {
      churn.toDF("doc_id", "text")
        .transform(VocabStats.vocabGrowth("doc_id", "text", 5))
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(gotChurn.map(_._4) === Seq(10L, 20L, 30L, 40L),
      "every token new: cum_vocab == cum_tokens")
    assert(gotChurn.map(t => t._3 - t._4).forall(_ == 0L))
  }

  test("vocabGrowth counts empty documents in the doc spine, not the vocab") {
    val docs = Seq((0L, "x y"), (1L, ""), (2L, "   "), (3L, "x z"))
    val got = graft.ops.Staged.withStaged {
      docs.toDF("doc_id", "text")
        .transform(VocabStats.vocabGrowth("doc_id", "text", 2))
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(got === Seq((0L, 2L, 2L, 2L), (1L, 4L, 4L, 3L)))
  }

  test("hapax closed forms: all-churn reads 10000/10000; templated text reads 0") {
    import org.apache.spark.sql.functions._
    // churn: every token unique -> every vocab entry is a hapax and
    // every token is one
    val churn = (1L to 10L).map(i => ("a", s"u$i v$i w$i")).toDF("source", "text")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("nv"), sum("c").as("nt"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("nh"))
      .as[(String, Long, Long, Long)].collect()(0)
    val ch = run(churn)
    assert(ch._4 === ch._2 && ch._4 === ch._3,
      "all 30 tokens distinct and single-occurrence")
    // template: three tokens repeated forever -> zero hapaxes
    val tmpl = (1L to 10L).map(_ => ("b", "same three words")).toDF("source", "text")
    val tm = run(tmpl)
    assert(tm._2 === 3L && tm._4 === 0L)
  }

  // ---- profileOverlap: pairwise histogram intersection ----

  private def runOverlap(docs: Seq[(String, String)]) =
    graft.ops.Staged.withStaged {
      VocabStats.profileOverlap("source", "text")(docs.toDF("source", "text"))
        .as[(String, String, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap
    }

  /** Plain-Scala reference: whitespace-tokenize, count, then the exact
    * cross-multiplied intersection and vocab jaccard in BigInt. */
  private def refOverlap(docs: Seq[(String, String)]) = {
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> BigInt(xs.size) }
    }
    val srcs = bySrc.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = bySrc(srcs(i)); b = bySrc(srcs(j))
      ta = a.values.sum; tb = b.values.sum
    } yield {
      val shared = a.keySet.intersect(b.keySet)
      val inter = shared.toSeq.map(t => (a(t) * tb).min(b(t) * ta)).sum
      (srcs(i), srcs(j)) -> (a.size.toLong, b.size.toLong, shared.size.toLong,
        (inter * 10000 / (ta * tb)).toLong,
        (BigInt(shared.size) * 10000 / (a.size + b.size - shared.size)).toLong)
    }).toMap
  }

  test("profileOverlap equals the BigInt reference on generated corpora") {
    Seq(3, 11, 23, 47, 61, 89).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nSrc = 2 + rnd.nextInt(4)
      val docs = (0 until 30).map { _ =>
        val src = s"s${rnd.nextInt(nSrc)}"
        val words = (0 until 1 + rnd.nextInt(12))
          .map(_ => s"w${rnd.nextInt(15)}")
        (src, words.mkString(" "))
      }
      assert(runOverlap(docs) === refOverlap(docs), s"seed=$seed")
    }
  }

  test("profileOverlap closed forms: identical, fractional, disjoint — and the grid keeps disjoint pairs") {
    val docs = Seq(
      ("a", "x x y"), ("b", "x z z"), // intersection exactly 1/3
      ("c", "x x y"),                 // identical to a
      ("d", "p q"))                   // disjoint from everything
    val got = runOverlap(docs)
    assert(got.size === 6, "full pair grid: C(4,2) rows")
    // identical distributions: full mass, full vocab jaccard
    assert(got(("a", "c")) === (2L, 2L, 2L, 10000L, 10000L))
    // min(2/3,1/3) on x = 1/3 of the mass; 1 of 3 union vocab
    assert(got(("a", "b")) === (2L, 2L, 1L, 3333L, 3333L))
    // disjoint: zero everything, but the row EXISTS
    assert(got(("a", "d")) === (2L, 2L, 0L, 0L, 0L))
    assert(got(("b", "d")) === (2L, 2L, 0L, 0L, 0L))
  }
}
