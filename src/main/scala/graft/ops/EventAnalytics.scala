package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream — the funnel and
  * cohort-retention operators every telemetry/product pipeline runs on
  * its event table (reference analog: the loom event/stop history is
  * exactly such a stream; SURVEY §1.2 stop_history). Both operators are
  * window/aggregate compositions at (user)-grain — no self-joins over
  * the event table, no driver-side state, nothing scales with event
  * count beyond the one per-user shuffle.
  */
object EventAnalytics {

  /** Ordered funnel: for each prefix of `steps`, how many users
    * completed it IN ORDER (each step strictly after the previous
    * one's first completion — the classic "first-touch" funnel),
    * optionally within `withinUs` microseconds of the previous step
    * (the conversion-window form every product-analytics engine ships;
    * without a window a long-lived event stream saturates every step).
    * Emits one row per step: (step, event_type, n_users,
    * pct_of_first 4dp).
    *
    * Shape: one Exchange on the user key, then one chained Window per
    * step over that same partitioning (consecutive Window nodes, no
    * re-shuffle — each step's first-reach time references the previous
    * column); per-user flags collapse map-side into #steps counters.
    * The step list is a few literals — the output is #steps rows.
    * All time math runs on epoch-µs longs (`unix_micros`), the
    * engine-independent unit of the verify contract. */
  def funnel(userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], withinUs: Option[Long] = None)
            (events: DataFrame): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinUs.forall(_ > 0), s"withinUs must be positive: $withinUs")
    val w = Window.partitionBy(userCol)
    // fold: t_i = min µs of step_i strictly after (and within the
    // conversion window of) t_{i-1}
    val withReach = steps.zipWithIndex.foldLeft(
      events.withColumn("__us", unix_micros(col(tsCol)))) { case (df, (step, i)) =>
      val cond: Column =
        if (i == 0) col(typeCol) === step
        else withinUs.foldLeft(
          col(typeCol) === step && col("__us") > col(s"__t${i - 1}")) {
          (c, win) => c && col("__us") - col(s"__t${i - 1}") <= win
        }
      df.withColumn(s"__t$i", min(when(cond, col("__us"))).over(w))
    }
    val reached = steps.indices.map(i => max(col(s"__t$i").isNotNull).as(s"__r$i"))
    val perUser = withReach
      .groupBy(userCol)
      .agg(reached.head, reached.tail: _*)
    val stepCounts = steps.indices.map(i =>
      count(when(col(s"__r$i"), lit(1))).as(s"__c$i"))
    val counts = perUser.agg(count(lit(1)).as("__n"), stepCounts: _*)
    // #steps rows out of the single aggregate row — a stack generator,
    // not a join; pct_of_first divides inside that row, so no window
    counts.select(
      stack(
        lit(steps.size) +:
          steps.zipWithIndex.flatMap { case (step, i) =>
            Seq(lit(i + 1).cast("long"), lit(step), col(s"__c$i"),
              graft.functions.Num.round4(col(s"__c$i") / col("__c0")))
          }: _*)
        .as(Seq("step", "event_type", "n_users", "pct_of_first")))
  }

  /** Cohort retention: users cohorted by their first-ever event day;
    * for each (cohort day, day offset) the distinct users active that
    * day and the retention ratio vs the cohort's size. Day keys are
    * epoch-day longs (representation-independent across engines).
    *
    * Shape: one Exchange on the user key (first-day window), one on
    * (cohort, offset) for the distinct count; the per-cohort size
    * joins back via a window over the tiny cohort×offset matrix. */
  def cohortRetention(userCol: String, tsCol: String)
                     (events: DataFrame): DataFrame = {
    val epoch = lit("1970-01-01")
    val byUser = Window.partitionBy(userCol)
    val matrix = events
      .withColumn("__d", datediff(to_date(col(tsCol)), epoch).cast("long"))
      .withColumn("__c", min(col("__d")).over(byUser))
      .groupBy(col("__c").as("cohort_d"),
        (col("__d") - col("__c")).as("offset_d"))
      .agg(countDistinct(col(userCol)).as("n_active"))
    // offset 0 always exists (the cohort's defining day) — its count is
    // the cohort size; the matrix is days×days, window cost is nil
    matrix.withColumn("retention",
      graft.functions.Num.round4(
        col("n_active") /
          max(when(col("offset_d") === 0, col("n_active"))).over(
            Window.partitionBy("cohort_d"))))
  }
}
