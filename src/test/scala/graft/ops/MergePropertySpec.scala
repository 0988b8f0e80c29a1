package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated merge laws (SURVEY §5.2): idempotence and
  * ingest-order invariance of the last-writer-wins merge, for arbitrary
  * keyed inputs with distinct version tiebreaks. (Raw ScalaCheck Gen with
  * fixed seeds — the scalatest/scalacheck bridge isn't on the offline
  * classpath.) */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Long, Double)]] =
    Gen.listOfN(40, for {
      user <- Gen.choose(1L, 5L)
      typ <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 1000).map(_.toDouble)
    } yield (user, typ, 0L, v)).map(_.zipWithIndex.map {
      // version = unique index → distinct tiebreaks guaranteed
      case ((u, t, _, v), i) => (u, t, i.toLong, v)
    })

  test("property: merge is idempotent, order-invariant, and matches plain-Scala semantics") {
    (1 to 5).foreach { seed =>
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = rows.toDF("user_id", "event_type", "ver", "value")
      val merge = Merge.lastWriterWins(Seq("user_id", "event_type"),
        Seq(col("ver").desc)) _
      val once = merge(df)
      // idempotent
      assert(merge(once).exceptAll(once).count() === 0, s"seed=$seed idempotence")
      // order-invariant
      val reversed = merge(rows.reverse.toDF("user_id", "event_type", "ver", "value"))
      assert(once.exceptAll(reversed).count() === 0 &&
        reversed.exceptAll(once).count() === 0, s"seed=$seed order")
      // equals the reference semantics computed in plain Scala
      val expected = rows.groupBy(r => (r._1, r._2))
        .map { case (_, g) => g.maxBy(_._3) }.toSet
      val got = once.as[(Long, String, Long, Double)].collect().toSet
      assert(got === expected, s"seed=$seed semantics")
    }
  }
}
