package graft.functions

import graft.SparkSpec

class WeightedMeanAggSpec extends SparkSpec {
  import spark.implicits._

  private val agg =
    WeightedMeanAgg[(String, Double, Double)](r => (r._2, r._3)).toColumn

  test("weighted mean: efficiency weighted by running minutes, not avg-of-avgs") {
    // (loom, efficiency, running-minutes)
    val df = Seq(("L1", 90.0, 100.0), ("L1", 50.0, 300.0), ("L2", 80.0, 0.0)).toDS()
    val out = df.groupByKey(_._1).agg(agg.name("weff")).collect().toMap
    assert(math.abs(out("L1") - 60.0) < 1e-12) // (90*100+50*300)/400
    assert(out("L2").isNaN)                    // zero total weight
  }

  test("merge-ability: result invariant to partitioning") {
    val rows = (1 to 100).map(i => ("k", i.toDouble, (i % 7 + 1).toDouble))
    val one = rows.toDS().repartition(1).groupByKey(_._1).agg(agg).collect().head._2
    val many = rows.toDS().repartition(13).groupByKey(_._1).agg(agg).collect().head._2
    assert(math.abs(one - many) < 1e-9)
  }
}
