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

  private def runTri(pairs: Seq[(Long, Long)], parts: Int = 1)
      : Map[Long, (Long, Long, Option[Long])] = Staged.withStaged {
    Centrality.triangleStats(
        pairs.toDF("a", "b").repartition(parts), "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("triangleStats: clique closes fully, path not at all, pendant dilutes the hub") {
    val out = runTri(Seq(
      // 4-clique: 4 triangles, every node in 3, closure 10⁴
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      // path: middle node's wedge never closes
      (10L, 11L), (11L, 12L),
      // triangle with a pendant: hub 20 has deg 3 but only 1 of its
      // 3 wedges closes → 3333 bp (floor)
      (20L, 21L), (21L, 22L), (20L, 22L), (20L, 23L)))
    for (n <- 1L to 4L) assert(out(n) === ((3L, 3L, Some(10000L))), s"clique $n")
    assert(out(11L) === ((2L, 0L, Some(0L))))
    assert(out(10L) === ((1L, 0L, None)) && out(12L) === ((1L, 0L, None)))
    assert(out(20L) === ((3L, 1L, Some(3333L))))
    assert(out(21L) === ((2L, 1L, Some(10000L))))
    assert(out(23L) === ((1L, 0L, None)))
  }

  test("triangleStats: input edge orientation is irrelevant, each triangle counts once") {
    val canonical = runTri(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val reversed = runTri(Seq((2L, 1L), (3L, 2L), (1L, 3L)))
    assert(canonical === reversed)
    assert(canonical(1L) === ((2L, 1L, Some(10000L))))
  }

  test("triangleStats: equals the brute-force count on a seeded random graph, any partitioning") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val pairs = (for {
      a <- 0L until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.keys.map { v =>
      val nb = adj(v).toSeq
      val t = (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if adj(nb(i)).contains(nb(j))
      } yield 1).size.toLong
      val d = nb.size.toLong
      v -> ((d, t, if (d >= 2) Some(2 * t * 10000 / (d * (d - 1))) else None))
    }.toMap
    assert(runTri(pairs) === expected)
    assert(runTri(pairs, parts = 7) === expected)
  }

  // ---- modularity of a given partition ----

  private def runQ(edges: Seq[(Long, Long)], labels: Seq[(Long, String)]) =
    graft.ops.Staged.withStaged {
      Centrality.modularity(edges.toDF("a", "b"), "a", "b",
          labels.toDF("id", "part"), "id", "part")
        .as[(Long, Long, Long, Option[Long])].collect()(0)
    }

  /** BigInt rational reference: Q·10⁴ truncated toward zero. */
  private def refQ(edges: Seq[(Long, Long)], labels: Map[Long, String]): Option[Long] = {
    if (edges.isEmpty) return None
    val m = BigInt(edges.size)
    val parts = labels.values.toSet
    val num = parts.toSeq.map { p =>
      val mc = BigInt(edges.count(e => labels(e._1) == p && labels(e._2) == p))
      val d = BigInt(edges.count(e => labels(e._1) == p) +
        edges.count(e => labels(e._2) == p))
      4 * m * mc - d * d
    }.sum
    val den = 4 * m * m
    Some((if (num >= 0) num * 10000 / den else -((-num) * 10000 / den)).toLong)
  }

  test("modularity closed forms: two clean communities 5000, one blob 0, pure cross-cut -5000") {
    // two disjoint triangles, each its own part
    val tri2 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val own = Seq(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y", 5L -> "y", 6L -> "y")
    assert(runQ(tri2, own) === ((6L, 6L, 2L, Some(5000L))))
    // the same graph, everything in one part: Q = 0 exactly
    val blob = own.map { case (id, _) => id -> "all" }
    assert(runQ(tri2, blob) === ((6L, 6L, 1L, Some(0L))))
    // a perfect bipartite cut labeled by side: every edge crosses
    val cross = Seq((1L, 4L), (2L, 5L), (3L, 6L))
    assert(runQ(cross, own) === ((3L, 0L, 2L, Some(-5000L))))
    // empty edge set: zeros and NULL Q
    assert(runQ(Seq.empty, own) === ((0L, 0L, 0L, None)))
  }

  test("modularity equals the BigInt rational reference on generated graphs and labelings") {
    Seq(3, 17, 41, 71, 89, 131).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 12
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val labels = (0L until n).map(i => i -> s"p${rnd.nextInt(3)}")
      val got = runQ(edges, labels)
      assert((got._1, got._4) === ((edges.size.toLong,
        refQ(edges, labels.toMap))), s"seed=$seed")
    }
  }
}
