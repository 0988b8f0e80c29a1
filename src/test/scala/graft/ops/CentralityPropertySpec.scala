package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated laws for the round-9 continuation operators:
  * PageRank ≡ its plain-Scala reference on arbitrary graphs, symmetry
  * under edge-direction flips, and RRF's list-order invariance.
  * (Raw Gen with fixed seeds — the scalatest/scalacheck bridge isn't on
  * the offline classpath, the MergePropertySpec pattern.) */
class CentralityPropertySpec extends SparkSpec {
  import spark.implicits._

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

  private val graphGen: Gen[(Seq[Long], Seq[(Long, Long)])] = for {
    n <- Gen.choose(3, 12)
    nodes = (1L to n.toLong).toSeq
    edges <- Gen.listOf(for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield (nodes, edges.distinct)

  test("property: distributed PageRank equals the reference on arbitrary graphs; direction-flip symmetric") {
    (1 to 6).foreach { seed =>
      val (nodes, pairs) = graphGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      def run(ps: Seq[(Long, Long)]): Map[Long, Long] = Staged.withStaged {
        val e = if (ps.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
                else ps.toDF("a", "b")
        Centrality.pageRankQuantized(nodes.toDF("node"), e, "node", "a", "b", 3)
          .as[(Long, Long)].collect().toMap
      }
      val got = run(pairs)
      assert(got === reference(nodes, pairs, 3), s"seed=$seed vs reference")
      // the graph is undirected by contract: flipping every stored edge
      // changes nothing
      assert(got === run(pairs.map(_.swap)), s"seed=$seed flip symmetry")
    }
  }

  test("property: triangleStats equals the brute-force adjacency count on arbitrary graphs, flip-symmetric") {
    (1 to 6).foreach { seed =>
      val (_, pairs) = graphGen.pureApply(Gen.Parameters.default, Seed(seed.toLong + 100))
      if (pairs.nonEmpty) {
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
        def runTri(ps: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Long])] =
          Staged.withStaged {
            Centrality.triangleStats(ps.toDF("a", "b"), "a", "b")
              .as[(Long, Long, Long, Option[Long])].collect()
              .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
          }
        assert(runTri(pairs) === expected, s"seed=$seed vs brute force")
        assert(runTri(pairs.map(_.swap)) === expected, s"seed=$seed flip symmetry")
      }
    }
  }

  private val listsGen: Gen[List[List[(Long, Long)]]] =
    Gen.listOfN(3, for {
      k <- Gen.choose(2, 8)
      ids <- Gen.pick(k, 1L to 20L)
    } yield ids.toList.zipWithIndex.map { case (id, i) => (id, i + 1L) })

  test("property: RRF fusion is invariant under list order") {
    (1 to 6).foreach { seed =>
      val lists = listsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .map(_.toDF("doc_id", "rank"))
      val a = Retrieval.rrfFuse(lists, "doc_id", 50)
        .as[(Long, Long, Long)].collect().toSet
      val b = Retrieval.rrfFuse(lists.reverse, "doc_id", 50)
        .as[(Long, Long, Long)].collect().toSet
      assert(a === b, s"seed=$seed")
      // every fused score is the exact sum of its lists' contributions
      val contrib = lists.flatMap(_.as[(Long, Long)].collect())
        .groupBy(_._1).view.mapValues(rs =>
          (rs.size.toLong, rs.map(r => 100000000L / (60L + r._2)).sum)).toMap
      a.foreach { case (id, n, s) => assert(contrib(id) === ((n, s)), s"seed=$seed id=$id") }
    }
  }
}
