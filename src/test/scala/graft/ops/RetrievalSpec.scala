package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def filler(n: Int) = (1 to n).map(i => s"pad$i").mkString(" ")

  test("bm25TopK: tf monotonicity, length normalization, and zero-match exclusion") {
    val docs = Seq(
      (1L, "cat " + filler(20)),                       // tf=1, long
      (2L, "cat cat " + filler(20)),                   // tf=2, same length → above doc 1
      (3L, "cat " + filler(5)),                        // tf=1, short → above doc 1
      (4L, filler(10))                                 // no match → excluded
    ).toDF("doc_id", "text")
    val out = docs.transform(Retrieval.bm25TopK("doc_id", "text", Seq("cat"), 10))
      .as[(Long, Long, Double)].collect()
    val order = out.map(_._1).toSeq
    assert(!order.contains(4L), "zero-match doc must not appear")
    assert(order.indexOf(2L) < order.indexOf(1L), "higher tf must outrank at equal length")
    assert(order.indexOf(3L) < order.indexOf(1L), "shorter doc must outrank at equal tf")
    assert(out.forall(_._2 === 1L))
  }

  test("bm25TopK: a rare term outweighs a corpus-saturating term (idf)") {
    // 'common' appears in every doc; 'rare' in one — at tf=1 each, the
    // rare-term doc must rank above a common-term-only doc
    val docs = (1L to 9L).map(i => (i, "common " + filler(10))) :+
      (10L, "rare " + filler(10))
    val out = docs.toDF("doc_id", "text")
      .transform(Retrieval.bm25TopK("doc_id", "text", Seq("common", "rare"), 10))
      .as[(Long, Long, Double)].collect()
    assert(out.head._1 === 10L, s"rare-term doc must rank first, got ${out.toSeq}")
  }

  test("bm25TopK: matched counts distinct query terms; k cuts after the integer-score order") {
    val docs = Seq(
      (1L, "alpha beta " + filler(8)),                 // matches both terms
      (2L, "alpha " + filler(9)),                      // one term
      (3L, "beta " + filler(9)),
      (4L, "alpha alpha " + filler(8))
    ).toDF("doc_id", "text")
    val all = docs.transform(Retrieval.bm25TopK("doc_id", "text", Seq("alpha", "beta"), 10))
      .as[(Long, Long, Double)].collect()
    assert(all.find(_._1 == 1L).get._2 === 2L)
    assert(all.find(_._1 == 2L).get._2 === 1L)
    assert(all.head._1 === 1L, "two distinct matched terms outrank a repeat of one")
    val top1 = docs.transform(Retrieval.bm25TopK("doc_id", "text", Seq("alpha", "beta"), 1))
      .as[(Long, Long, Double)].collect()
    assert(top1.map(_._1).toSeq === Seq(all.head._1), "k=1 keeps exactly the global head")
  }

  test("bm25TopK: partition-invariant (quantized integer partials make the sum order-free)") {
    val docs = (1L to 40L).map(i =>
      (i, ("term " * (i % 4 + 1).toInt) + filler((i % 7).toInt + 3))).toDF("doc_id", "text")
    val a = docs.coalesce(1)
      .transform(Retrieval.bm25TopK("doc_id", "text", Seq("term"), 15))
      .as[(Long, Long, Double)].collect().toSeq
    val b = docs.repartition(7)
      .transform(Retrieval.bm25TopK("doc_id", "text", Seq("term"), 15))
      .as[(Long, Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("rrfFuse: closed-form fused scores, consensus wins, k cut on (score, id)") {
    def list(rs: (Long, Long)*) = rs.toSeq.toDF("doc_id", "rank")
    // list A ranks 10,11,12; list B ranks 11,13,12 — doc 11 is the
    // consensus pick despite topping neither list
    val a = list(10L -> 1L, 11L -> 2L, 12L -> 3L)
    val b = list(11L -> 1L, 13L -> 2L, 12L -> 3L)
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", k = 10)
      .as[(Long, Long, Long)].collect()
    def c(r: Long) = 100000000L / (60L + r)
    val expected = Map(
      10L -> (1L, c(1)), 11L -> (2L, c(2) + c(1)),
      12L -> (2L, c(3) + c(3)), 13L -> (1L, c(2)))
    assert(out.map(r => r._1 -> (r._2, r._3)).toMap === expected)
    // consensus ordering: 11 (both lists) > 12 (both, lower) > 10 = top
    // of one list only
    assert(out.map(_._1).toSeq === Seq(11L, 12L, 10L, 13L))
    // k cut with id tiebreak: docs 10 and 13... make an exact tie
    val t1 = list(1L -> 1L, 3L -> 2L)
    val t2 = list(2L -> 1L, 4L -> 2L)
    val cut = Retrieval.rrfFuse(Seq(t1, t2), "doc_id", k = 3)
      .as[(Long, Long, Long)].collect().map(_._1).toSeq
    // scores tie pairwise (1,2) and (3,4): id breaks both; k=3 keeps 1,2,3
    assert(cut === Seq(1L, 2L, 3L))
  }

  test("mmrRerank matches a plain-Scala MMR on generated vectors; divWeight=0 degenerates to top-k relevance") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def ref(vecs: Seq[(Long, Array[Double])], qid: Long, k: Int,
            rw: Double, dw: Double): Seq[(Long, Double)] = {
      val n2 = vecs.map { case (id, v) => (id, v, dotp(v, v)) }
      val (_, qv, qn2) = n2.find(_._1 == qid).get
      val cands = n2.filter(_._1 != qid)
        .map { case (id, v, nn) => (id, v, nn, dotp(v, qv) / (math.sqrt(nn) * math.sqrt(qn2))) }
      var sel = List.empty[(Array[Double], Double)]
      var pickedIds = Set.empty[Long]
      var out = Vector.empty[(Long, Double)]
      for (_ <- 1 to k) {
        val scored = cands.filter(c => !pickedIds(c._1)).map { case (id, v, nn, rel) =>
          val sc = if (sel.isEmpty) rel
            else rw * rel - dw * sel.map { case (cv, cn2) =>
              dotp(v, cv) / (math.sqrt(nn) * math.sqrt(cn2)) }.max
          (id, v, nn, sc)
        }
        val best = scored.minBy { case (id, _, _, sc) => (-sc, id) }
        out :+= ((best._1, best._4))
        sel :+= ((best._2, best._3))
        pickedIds += best._1
      }
      out
    }
    val gen = for {
      n <- Gen.choose(3, 25)
      vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(1, 100)))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_ / 10.0f).toArray) }
    for (seed <- 1 to 4) {
      val vecs = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val k = math.min(4, vecs.size - 1)
      val got = Retrieval.mmrRerank(
          vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", 0L, k)
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      val expect = ref(vecs.map { case (i, v) => (i, v.map(_.toDouble)) },
        0L, k, 0.7, 0.3)
      assert(got.map(_._2) === expect.map(_._1), s"seed=$seed")
      got.zip(expect).foreach { case ((_, _, sc), (_, e)) =>
        assert(math.abs(sc - e) <= 1.1e-4, s"seed=$seed: $sc vs $e")
      }
    }
    // divWeight 0: pure relevance order (the ranker's own top-k)
    val vecs = gen.pureApply(Gen.Parameters.default, Seed(42L))
    val mmr0 = Retrieval.mmrRerank(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0L, 3, relWeight = 1.0, divWeight = 0.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1).map(_._2).toSeq
    val topRel = ref(vecs.map { case (i, v) => (i, v.map(_.toDouble)) },
      0L, 3, 1.0, 0.0).map(_._1)
    assert(mmr0 === topRel)
  }

  test("mmrRerank: under a diversity-heavy weighting an exact duplicate of the top pick is demoted below a diverse alternative") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),  // the query
      (1L, Array(0.9f, 0.1f, 0f, 0f)), // most relevant
      (2L, Array(0.9f, 0.1f, 0f, 0f)), // its exact duplicate (sim 1.0)
      (3L, Array(0.5f, 0f, 0.8f, 0f))) // less relevant but diverse
    // 0.3/0.7: doc2 scores 0.3·0.994 − 0.7·1.0 ≈ −0.40, doc3 scores
    // 0.3·0.53 − 0.7·0.53 ≈ −0.21 → diversity wins round 2
    val got = Retrieval.mmrRerank(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0L, 3, relWeight = 0.3, divWeight = 0.7)
      .as[(Long, Long, Double)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got === Seq(1L, 3L, 2L), got.toString)
    // at the default relevance-heavy 0.7/0.3 the duplicate's relevance
    // still outranks — the λ knob is real, both orders are correct MMR
    val dflt = Retrieval.mmrRerank(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0L, 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1).map(_._2).toSeq
    assert(dflt === Seq(1L, 2L, 3L), dflt.toString)
  }
}
