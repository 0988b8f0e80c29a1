package graft.functions

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeOnce: left-to-right non-overlapping merge") {
    assert(Bpe.mergeOnce(Vector("a", "b", "c"), ("a", "b")) === Vector("ab", "c"))
    // overlap resolves left-to-right: aaa -> (aa)a, not a(aa)
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), ("a", "a")) === Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("x"), ("a", "b")) === Vector("x"))
  }

  test("trainMerges: hand-computed merges on a tiny corpus, stops when no pair repeats") {
    // words: aa x3, ab x1. Round 1 pairs: (a,a)=3, (a,</w>)=3, (a,b)=1,
    // (b,</w>)=1 -> tie broken lexicographically: (a,</w>) wins
    // ('<' < 'a'). Round 2: (a,a</w>)=3 wins. Round 3: every remaining
    // pair occurs once -> training stops before the requested 10 merges.
    val docs = Seq("aa aa aa ab").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 10, maxWords = 100)
    assert(merges === Seq(("a", Bpe.EndOfWord), ("a", "a" + Bpe.EndOfWord)))
    // deterministic: same corpus, same tokenizer
    assert(Bpe.trainMerges(docs, "text", 10, maxWords = 100) === merges)
  }

  test("segmentWord: learned merges segment greedily in learned order") {
    val merges = Seq(("a", Bpe.EndOfWord), ("a", "a" + Bpe.EndOfWord))
    assert(Bpe.segmentWord("aa", merges) === Vector("aa" + Bpe.EndOfWord))
    assert(Bpe.segmentWord("ab", merges) === Vector("a", "b", Bpe.EndOfWord))
    assert(Bpe.segmentWord("aab", merges) === Vector("a", "a", "b", Bpe.EndOfWord))
  }

  test("reconstruction: segment symbols concatenate back to the word (real corpus)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMerges(docs, "text", 30, maxWords = 1000)
    assert(merges.nonEmpty)
    val words = Bpe.wordCounts(docs, "text", 50).select("w").as[String].collect()
    words.foreach { w =>
      assert(Bpe.segmentWord(w, merges).mkString === w + Bpe.EndOfWord, w)
    }
  }

  test("tokenizeCounts: typed-map projection, counts match per-word segmentation") {
    val docs = Seq((1L, "aa aa aa ab"), (2L, ""), (3L, "aa")).toDF("doc_id", "text")
    val merges = Seq(("a", Bpe.EndOfWord), ("a", "a" + Bpe.EndOfWord))
    val out = Bpe.tokenizeCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: 3 words x 1 symbol (aa</w>) + 1 word x 3 symbols (a,b,</w>)
    assert(out(0) === ((1L, 4L, 6L)))
    assert(out(1) === ((2L, 0L, 0L)))
    assert(out(2) === ((3L, 1L, 1L)))
    // a projection: no Exchange in the plan
    val p = Bpe.tokenizeCounts(docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
