package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantized PageRank (q141): equality with a hand-rolled reference of
  * the pinned integer iteration, centrality ordering on a star,
  * isolated-node base settling, and partition invariance. */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  /** The exact contract arithmetic, re-derived independently: ×10⁶
    * ranks, r′(i) = 150000 + (85·Σ(r(u) div deg(u))) div 100 over the
    * symmetrized edges. */
  private def reference(nodes: Seq[Long], pairs: Seq[(Long, Long)],
                        rounds: Int): Map[Long, Long] = {
    val dir = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val inc = dir.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 85L * inc.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)], rounds: Int = 3,
                  parts: Int = 1): Map[Long, Long] = Staged.withStaged {
    val n = nodes.toDF("node").repartition(parts)
    val e = pairs.toDF("a", "b").repartition(parts)
    Centrality.pageRankQuantized(n, e, "node", "a", "b", rounds)
      .as[(Long, Long)].collect().toMap
  }

  test("matches the hand-rolled integer iteration on a mixed graph") {
    val nodes = (1L to 8L).toSeq
    // a triangle, a pendant chain, an isolated pair's edge, one loner
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    assert(run(nodes, pairs) === reference(nodes, pairs, 3))
  }

  test("star center outranks its leaves; leaves tie") {
    val nodes = (0L to 6L).toSeq
    val pairs = (1L to 6L).map(l => (0L, l))
    val r = run(nodes, pairs)
    assert((1L to 6L).forall(l => r(0L) > r(l)))
    assert((1L to 6L).map(r).distinct.size === 1)
  }

  test("isolated nodes settle at base = (scale·15) div 100") {
    val r = run(Seq(1L, 2L, 9L), Seq((1L, 2L)))
    assert(r(9L) === 150000L)
    assert(r(1L) > 150000L) // connected nodes receive shares
  }

  test("partition invariance: shares sum identically under any layout") {
    val nodes = (1L to 20L).toSeq
    val pairs = nodes.flatMap(a => nodes.filter(b => b > a && (a + b) % 3 == 0).map((a, _)))
    assert(run(nodes, pairs, parts = 1) === run(nodes, pairs, parts = 7))
  }

  test("deeper iteration still matches the reference (star mass oscillation included)") {
    // a star is near-bipartite: hub mass OVERSHOOTS at round 1 (every
    // leaf's full rank arrives at once) and relaxes toward the fixpoint
    // on later rounds — rounds 1/3/5 must each equal the reference
    // exactly through that oscillation
    val nodes = (0L to 6L).toSeq
    val pairs = (1L to 6L).map(l => (0L, l))
    for (rounds <- Seq(1, 3, 5))
      assert(run(nodes, pairs, rounds = rounds) === reference(nodes, pairs, rounds),
        s"rounds=$rounds")
    val r1 = run(nodes, pairs, rounds = 1)
    val r5 = run(nodes, pairs, rounds = 5)
    assert(r1(0L) > r5(0L)) // the overshoot relaxes
    assert(r5(0L) > r5(1L)) // but the hub stays on top
  }
}
