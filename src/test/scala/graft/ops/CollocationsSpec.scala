package graft.ops

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiTopK: an always-together pair outranks independent pairs; minCount gates; k cuts") {
    // 'hong kong' always adjacent (perfect association); filler words
    // combine freely (low association); 'rare pair' occurs once (< minCount)
    val docs = (
      Seq.fill(6)("hong kong x1 x2 x3 x4") ++
      Seq.fill(6)("x1 x3 hong kong x2 x4") ++
      Seq("rare pair x1 x2 x3 x4")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Staged.withStaged {
      docs.transform(Collocations.pmiTopK("text", k = 10, minCount = 5L))
        .as[(String, String, Long, Double)].collect()
    }
    assert(out.head._1 === "hong" && out.head._2 === "kong",
      s"perfect collocation must rank first, got ${out.head}")
    assert(out.head._3 === 12L)
    assert(!out.exists(r => r._1 == "rare"), "minCount must gate the singleton pair")
    assert(out.forall(_._4 <= out.head._4), "descending pmi order")
    val top1 = Staged.withStaged {
      docs.transform(Collocations.pmiTopK("text", k = 1, minCount = 5L))
        .as[(String, String, Long, Double)].collect()
    }
    assert(top1.map(r => (r._1, r._2)).toSeq === Seq(("hong", "kong")))
  }

  test("pmiTopK: PMI value matches the closed form on a hand-countable corpus") {
    // one doc, 4 tokens, bigrams: (a b), (b a), (a b) → n1=4·3=… keep tiny:
    // corpus = 3 copies of "a b" → tokens: 6 (a:3, b:3), bigrams: 3 (all "a b")
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    val out = Staged.withStaged {
      docs.transform(Collocations.pmiTopK("text", k = 5, minCount = 3L))
        .as[(String, String, Long, Double)].collect()
    }
    // pmi = ln(c_xy·N1²/(c_x·c_y·N2)) = ln(3·36/(3·3·3)) = ln 4
    assert(out.length === 1)
    assert(out.head === (("a", "b", 3L, math.rint(math.log(4.0) * 10000) / 10000)))
  }

  test("pmiTopK: partition-invariant") {
    val docs = (1L to 30L).map(i => (i, s"p${i % 5} q${i % 5} r${i % 3} s t")).toDF("doc_id", "text")
    val a = Staged.withStaged {
      docs.coalesce(1).transform(Collocations.pmiTopK("text", 20, 2L))
        .as[(String, String, Long, Double)].collect().toSeq
    }
    val b = Staged.withStaged {
      docs.repartition(7).transform(Collocations.pmiTopK("text", 20, 2L))
        .as[(String, String, Long, Double)].collect().toSeq
    }
    assert(a === b)
  }
}
