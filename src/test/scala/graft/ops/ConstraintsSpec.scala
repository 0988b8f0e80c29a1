package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._
  import Constraints.Rule

  private val df = Seq(
    (1L, "alpha", 10L),
    (2L, "", 20L),
    (3L, "gamma", 30L),
    (3L, "delta", 400L)).toDF("id", "txt", "v")

  private val rules = Seq(
    Rule("rows_min_10", count(lit(1)), _ >= 10.0), // 4 rows → fail
    Rule("txt_complete",
      sum(when(length(trim(col("txt"))) === 0, 1L).otherwise(0L)),
      _ === 0.0), // one empty → fail
    Rule("id_unique", count(lit(1)) - countDistinct(col("id")),
      _ === 0.0), // dup id 3 → fail
    Rule("v_min_1", min(col("v")), _ >= 1.0), // pass
    Rule("v_mean_band", sum(col("v")) * lit(1.0) / count(lit(1)),
      m => m >= 50.0 && m <= 200.0)) // mean 115 → pass

  test("report: metrics and pass flags correct, declaration order, failing rules visible") {
    val rep = Constraints.report(df, rules)
      .as[(String, Double, Long)].collect().toSeq
    assert(rep === Seq(
      ("rows_min_10", 4.0, 0L),
      ("txt_complete", 1.0, 0L),
      ("id_unique", 1.0, 0L),
      ("v_min_1", 10.0, 1L),
      ("v_mean_band", 115.0, 1L)))
  }

  test("the whole rule battery runs in ONE pass over the input") {
    val plan = Constraints.report(df, rules)
      .queryExecution.executedPlan.toString
    // however many rules are declared, the source is scanned once
    // (countDistinct adds an Expand, not a second scan)
    assert(plan.split("LocalTableScan").length - 1 === 1, plan)
  }

  test("predicate sees the raw metric, report shows the rounded one") {
    val d2 = Seq(0.00004, 0.00004).toDF("x") // sum = 0.00008 → rounds to 0.0001
    val rep = Constraints.report(d2,
        Seq(Rule("sum_under_9e-5", sum(col("x")), _ <= 0.00009)))
      .as[(String, Double, Long)].collect().head
    assert(rep._2 === 0.0001) // display rounds up
    assert(rep._3 === 1L) // but the predicate judged the raw 0.00008
  }
}
