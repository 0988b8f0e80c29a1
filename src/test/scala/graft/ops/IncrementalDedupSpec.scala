package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The incremental-dedup contract: folding a new batch into an
  * already-deduplicated corpus equals a full rebuild on star-shaped
  * clusters (the ≡ case q74 demonstrates corpus-wide), and diverges
  * toward a documented SUPERSET — never a subset — on chain topologies
  * whose interior was removed by the earlier run. Unigram "shingles"
  * (n=1) make the Jaccard arithmetic exact in fixtures. Results are
  * collected INSIDE each Staged scope — the clusterer's checkpointed
  * labels don't outlive their query. */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private def toks(ids: Range, extra: String = "") =
    (ids.map(i => s"w$i") ++ (if (extra.isEmpty) Nil else extra.split(" ").toSeq))
      .mkString(" ")

  private def runCorpus(docs: DataFrame): Seq[(Long, String)] = Staged.withStaged {
    IncrementalDedup.dedupCorpus("doc_id", "text", 1, 0.5)(docs)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
  }

  private def runDelta(base: Seq[(Long, String)], fresh: DataFrame): Seq[(Long, String)] =
    Staged.withStaged {
      IncrementalDedup.dedupDelta("doc_id", "text", 1, 0.5)(
        base.toDF("doc_id", "text"), fresh)
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
    }

  test("star clusters: incremental ≡ full rebuild (near-dups, exact dups, fresh-only dups)") {
    val a = toks(1 to 8)
    val a2 = toks(1 to 7, "x1")            // J(a,a2)=7/9≈0.78
    val a3 = toks(2 to 8, "y1")            // J(a,a3)=7/9≈0.78
    val b = toks(101 to 108)
    val c = toks(201 to 208)
    val f1 = toks(301 to 308)
    val f2 = toks(301 to 307, "z1")        // J(f1,f2)≈0.78
    val old = Seq((1L, a), (2L, a2), (4L, b), (10L, c)).toDF("doc_id", "text")
    val fresh = Seq((11L, a3), (12L, b), (13L, f1), (14L, f2)).toDF("doc_id", "text")
    val base = runCorpus(old)
    assert(base.map(_._1).toSet === Set(1L, 4L, 10L))
    val incremental = runDelta(base, fresh)
    val rebuilt = runCorpus(old.unionByName(fresh))
    assert(incremental === rebuilt)
    assert(incremental.map(_._1).toSet === Set(1L, 4L, 10L, 13L))
  }

  test("fresh bridge merges two base clusters: the larger base rep is retroactively dropped, ≡ rebuild") {
    val p = toks(1 to 8)
    val q = toks(9 to 16)
    val bridge = toks(1 to 16)             // J(bridge,p)=J(bridge,q)=8/16=0.5
    val old = Seq((1L, p), (2L, q)).toDF("doc_id", "text")
    val fresh = Seq((3L, bridge)).toDF("doc_id", "text")
    val base = runCorpus(old)
    assert(base.map(_._1).toSet === Set(1L, 2L))
    val incremental = runDelta(base, fresh)
    val rebuilt = runCorpus(old.unionByName(fresh))
    assert(incremental === rebuilt)
    assert(incremental.map(_._1).toSet === Set(1L))
  }

  test("chain through a removed doc: incremental keeps a documented superset of the rebuild") {
    // a–b–c is a path (no a–c edge); old dedup keeps only a. New doc d
    // is near-dup of b (removed) but not of a — the rebuild reaches d
    // through b and drops it; the incremental graph can't, and keeps d.
    val a = toks(1 to 8)
    val b = toks(3 to 10)                  // J(a,b)=6/10=0.6
    val c = toks(5 to 12)                  // J(b,c)=0.6, J(a,c)=4/12≈0.33
    val d = toks(4 to 10, "q1")            // J(d,b)=7/9≈0.78, J(d,a)=5/11≈0.45
    val old = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fresh = Seq((4L, d)).toDF("doc_id", "text")
    val base = runCorpus(old)
    assert(base.map(_._1).toSet === Set(1L))
    val rebuilt = runCorpus(old.unionByName(fresh))
    val incremental = runDelta(base, fresh)
    assert(rebuilt.map(_._1).toSet === Set(1L))
    assert(incremental.map(_._1).toSet === Set(1L, 4L))
    assert(rebuilt.toSet.subsetOf(incremental.toSet))
  }

  test("delta pair generator: base×base pairs are never emitted; fresh pairs canonical and unique") {
    val a = toks(1 to 8)
    val a2 = toks(1 to 7, "x1")            // base near-dup pair (must NOT be emitted)
    val f = toks(1 to 6, "y1 y2")          // J(f,a)=J(f,a2)=6/10=0.6
    val base = Seq((1L, a), (2L, a2)).toDF("doc_id", "text")
    val fresh = Seq((5L, f)).toDF("doc_id", "text")
    val pairs = Staged.withStaged {
      Dedup.ngramJaccardPairsDelta("doc_id", "text", 1, 0.5)(base, fresh)
        .as[(Long, Long, Double)].collect().toSet
    }
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 5L), (2L, 5L)))
    pairs.foreach(p => assert(p._1 < p._2))
  }
}
