package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries laws (q152): the presence and error-bound guarantees
  * under arbitrary partitionings, exact degeneration when distinct ≤ k,
  * no-overcount, merge commutativity, and the k=1 majority edge. */
class MisraGriesAggSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: token t_i appears ~N/i times. */
  private def skewed(n0: Int, ranks: Int): Seq[String] =
    (1 to ranks).flatMap(r => Seq.fill(n0 / r)(s"t$r"))

  private def run(rows: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val mg = MisraGriesAgg[String](k, identity).toColumn
    rows.toDS().repartition(parts).select(mg.name("mg"))
      .as[Map[String, Long]].collect().head
  }

  test("presence and bound laws hold under any partitioning") {
    val rows = skewed(600, 25)
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(5, 10); parts <- Seq(1, 4, 13)) {
      val mg = run(rows, k, parts)
      assert(mg.size <= k, s"k=$k parts=$parts size=${mg.size}")
      // every TRUE heavy hitter (t > n/k) must be present
      exact.foreach { case (t, c) =>
        if (c > n.toLong / k)
          assert(mg.contains(t), s"heavy $t (count $c > $n/$k) missing, k=$k parts=$parts")
      }
      // every estimate within [t − n/k, t] — never overcounts
      mg.foreach { case (t, e) =>
        val c = exact(t)
        assert(e <= c, s"overcount $t: est $e > true $c")
        assert((c - e) * k <= n, s"undercount beyond n/k for $t: $c − $e, k=$k")
      }
    }
  }

  test("distinct ≤ k degenerates to exact counts, deterministically, any partitioning") {
    val rows = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(5)("c")
    for (parts <- Seq(1, 3, 8))
      assert(run(rows, k = 8, parts) === Map("a" -> 7L, "b" -> 3L, "c" -> 5L),
        s"parts=$parts")
  }

  test("k=1 majority edge: a strict majority element survives") {
    val rows = Seq.fill(12)("maj") ++ (1 to 9).map(i => s"m$i")
    for (parts <- Seq(1, 5)) {
      val mg = run(rows, k = 1, parts)
      assert(mg.keySet === Set("maj"), s"parts=$parts got $mg")
    }
  }

  test("merge is commutative and respects the size cap") {
    val agg = MisraGriesAgg[String](3, identity)
    val a = Map("x" -> 5L, "y" -> 2L, "z" -> 1L)
    val b = Map("y" -> 4L, "w" -> 3L, "v" -> 2L)
    val ab = agg.merge(a, b)
    assert(ab === agg.merge(b, a))
    assert(ab.size <= 3)
    // pointwise sums: x=5 y=6 z=1 w=3 v=2 → 4th largest (cut) = 2 →
    // survivors x=3 y=4 w=1
    assert(ab === Map("x" -> 3L, "y" -> 4L, "w" -> 1L))
  }
}
