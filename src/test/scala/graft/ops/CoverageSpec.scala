package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Greedy set cover must match a plain-Scala greedy with the same
  * universe bound and tie-breaks on arbitrary generated corpora, stop
  * early when coverage is exhausted, and keep the gain/covered_total
  * bookkeeping consistent (submodularity: gains non-increasing). */
class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private def ref(docs: Seq[(Long, Seq[String])], k: Int,
                  vocabLimit: Int): Seq[(Long, Long, Long, Long)] = {
    val tk = docs.map { case (id, ts) => (id, ts.toSet) }
    val counts = tk.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val universe = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(vocabLimit).map(_._1).toSet
    var covered = Set.empty[String]
    var picked = Set.empty[Long]
    var out = Vector.empty[(Long, Long, Long, Long)]
    var r = 1L
    var done = false
    while (r <= k && !done) {
      val cands = tk.filter(d => !picked(d._1))
        .map { case (id, ts) => (id, (ts & universe -- covered).size.toLong) }
        .filter(_._2 > 0) // zero-gain docs drop out of the aggregate
      if (cands.isEmpty) done = true
      else {
        val (id, gain) = cands.minBy { case (id, g) => (-g, id) }
        covered ++= (tk.find(_._1 == id).get._2 & universe)
        picked += id
        out :+= ((r, id, gain, covered.size.toLong))
        r += 1
      }
    }
    out
  }

  private val corpusGen: Gen[Seq[(Long, Seq[String])]] = for {
    n <- Gen.choose(1, 20)
    docs <- Gen.listOfN(n, Gen.listOf(Gen.choose(0, 40).map(i => s"t$i")))
  } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }

  test("greedySetCover matches the plain-Scala greedy on arbitrary corpora, incl. a tight universe bound") {
    for (seed <- 1 to 6; vocabLimit <- Seq(10, 1000)) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Coverage.greedySetCover(df, "doc_id",
          graft.functions.TextFunctions.tokens(col("text")), 5, vocabLimit)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got === ref(corpus, 5, vocabLimit),
        s"seed=$seed vocabLimit=$vocabLimit corpus=$corpus")
    }
  }

  test("bookkeeping: covered_total is the running sum of gains; gains are non-increasing (submodularity)") {
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c"),
      (3L, "f g"),
      (4L, "e f g h"),
      (5L, "x")).toDF("doc_id", "text")
    val got = Coverage.greedySetCover(df, "doc_id",
        graft.functions.TextFunctions.tokens(col("text")), 5)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._3) === got.map(_._3).sorted.reverse)
    got.foldLeft(0L) { case (acc, (_, _, gain, total)) =>
      assert(total === acc + gain); total
    }
    // greedy picks: doc1 (5 new), doc4 (3 new), doc5 (1 new); docs 2,3
    // then have zero gain → early stop at 3 rounds even though k=5
    assert(got.map(_._2) === Seq(1L, 4L, 5L))
  }

  test("tie-break: equal gain goes to the smallest doc id") {
    val df = Seq((7L, "p q"), (3L, "r s"), (9L, "p q")).toDF("doc_id", "text")
    val got = Coverage.greedySetCover(df, "doc_id",
        graft.functions.TextFunctions.tokens(col("text")), 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._2) === Seq(3L, 7L))
  }
}
