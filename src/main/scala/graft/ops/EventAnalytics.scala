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

  /** Windowed rate-anomaly detection: per (type, time bucket), flag
    * counts whose deviation from the trailing-window mean exceeds k
    * standard deviations — the volume-spike/drop monitor an event
    * intake runs continuously. The z-test is EXACT INTEGER arithmetic:
    * with W trailing buckets of sum S and sum-of-squares Q,
    *   z² > k²  ⟺  (n·W − S)² > k²·(W·Q − S²)
    * — no division, no sqrt, no floats, so the flag cannot drift
    * cross-engine (the q140 no-arithmetic-left discipline applied to a
    * statistical test). A zero-variance window (constant rate) flags on
    * ANY deviation, which the inequality encodes naturally.
    *
    * The trailing frame is over OBSERVED buckets (`ROWS BETWEEN`):
    * gaps collapse, which is the behavior you want on sparse types;
    * densify against a bucket spine first if strict wall-clock windows
    * matter. Scale: one (type, bucket)-grain aggregate with map-side
    * partials, then per-type windows over the #types·#buckets matrix —
    * never the event table. Output: (event_type, bucket, n, w,
    * z2_num, z2_den, anomaly 0/1), rows with w < minTrailing withheld
    * (cold-start buckets have no baseline to test against). */
  def rateAnomalies(tsCol: String, typeCol: String,
                    bucketUs: Long = 3600000000L, trailing: Int = 24,
                    k2: Long = 9L, minTrailing: Int = 6)
                   (events: DataFrame): DataFrame = {
    require(bucketUs > 0 && trailing > 0 && k2 >= 0 && minTrailing >= 1,
      s"bad parameters bucketUs=$bucketUs trailing=$trailing k2=$k2 minTrailing=$minTrailing")
    val counts = events
      .select(col(typeCol).as("event_type"),
        expr(s"unix_micros($tsCol) div ${bucketUs}L").as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(-trailing, -1)
    counts
      .withColumn("w", count(lit(1)).over(w))
      .withColumn("__s", sum("n").over(w))
      .withColumn("__q", sum(col("n") * col("n")).over(w))
      .filter(col("w") >= minTrailing)
      .withColumn("__dev", col("n") * col("w") - col("__s"))
      .select(col("event_type"), col("bucket"), col("n"), col("w"),
        (col("__dev") * col("__dev")).as("z2_num"),
        (col("w") * col("__q") - col("__s") * col("__s")).as("z2_den"),
        when(col("__dev") * col("__dev") >
            lit(k2) * (col("w") * col("__q") - col("__s") * col("__s")), 1L)
          .otherwise(0L).as("anomaly"))
  }

  /** SCD2-style status history: read the event stream as a change log
    * (each event sets its user's current status to its type), collapse
    * consecutive repeats of the same status, and emit validity
    * intervals `[valid_from_us, valid_to_us)` — the
    * snapshot-to-interval build every warehouse runs to answer "what
    * was X's status at time T" with an as-of probe
    * ([[graft.ops.AsOfJoin]]) instead of a scan of the raw log. The
    * open current interval carries a NULL `valid_to_us` and
    * `is_current = 1`.
    *
    * Repeat observations are absorbed into the run's interval (SCD2
    * collapses no-op changes), so output size is the number of status
    * CHANGES, typically far below the event count. Ordering inside a
    * user is (ts, id) — the id tiebreak makes equal instants
    * deterministic, like the q42 sessionizer's.
    *
    * Shape: ONE Exchange on the user key — the repeat-collapse lag
    * window, the filter, and the interval lead window all run over the
    * same user partitioning (a Filter preserves its child's
    * partitioning, so the second Window reuses the first's Exchange). */
  def statusIntervals(userCol: String, tsCol: String, typeCol: String,
                      idCol: String)(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col("__us"), col(idCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col(typeCol), 1).over(byUser))
      .filter(col("__prev").isNull || col("__prev") =!= col(typeCol))
      .withColumn("valid_to_us", lead(col("__us"), 1).over(byUser))
      .select(col(userCol), col(typeCol).as("status"),
        col("__us").as("valid_from_us"), col("valid_to_us"),
        when(col("valid_to_us").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** Rolling active-user engagement: per active day, the distinct
    * users active that day (DAU), in the trailing 7 days (WAU), and in
    * the trailing 30 days (MAU), plus the DAU/MAU stickiness ratio in
    * exact basis points — the product-health trio every event pipeline
    * reports, and the missing sibling of the cohort matrix (q128
    * answers "does a cohort come back?", this answers "how big is the
    * active base right now?").
    *
    * Distinct-over-sliding-window does not decompose into window
    * functions, so the scalable form is COVERAGE FAN-OUT: dedup events
    * to the (user, day) grain (the only corpus-grain shuffle — the
    * user-day table is orders of magnitude smaller than the event
    * table), fan each user-day out to the ≤30 future days it keeps the
    * user "active" for, and count distinct users per covered day in
    * one aggregate (the three readings are conditional distincts on
    * the coverage offset, one Expand). The day spine (active days
    * only) is tiny and semi-joins broadcast. Day keys are epoch-day
    * longs; stickiness_bp = (dau·10⁴) div mau on positive operands. */
  def activeUsers(userCol: String, tsCol: String)
                 (events: DataFrame): DataFrame = {
    val epoch = lit("1970-01-01")
    val ud = events.select(col(userCol).as("u"),
      datediff(to_date(col(tsCol)), epoch).cast("long").as("d")).distinct()
    val spine = ud.select(col("d").as("day")).distinct()
    val fan = ud
      .select(col("u"), col("d"), explode(sequence(lit(0), lit(29))).as("off"))
      .select(col("u"), (col("d") + col("off")).as("day"), col("off"))
    fan.join(spine, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(
        countDistinct(when(col("off") === 0, col("u"))).as("dau"),
        countDistinct(when(col("off") <= 6, col("u"))).as("wau"),
        countDistinct(col("u")).as("mau"))
      .withColumn("stickiness_bp", expr("(dau * 10000L) div mau"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: order each user's events by (ts, id), pair each event
    * with its successor, and count (current → next) transitions
    * globally, with add-one (Laplace) smoothed row-probabilities over
    * the observed event-type alphabet — the behavior model behind
    * next-event prediction, synthetic-session generation, and
    * drift-vs-baseline monitoring of an intake stream.
    *
    * Shape: ONE Exchange on the user key for the successor window,
    * then the transition aggregate collapses map-side to ≤ |types|²
    * rows; the row totals and the alphabet size are aggregates OF that
    * tiny matrix (broadcast back), never a second pass over the event
    * table. The (ts, id) tiebreak makes equal instants deterministic,
    * like the q42 sessionizer's. */
  def markovTransitions(userCol: String, tsCol: String, typeCol: String,
                        idCol: String)(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(userCol)
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    // staged: totals and the alphabet are aggregates OF this ≤|types|²
    // matrix — without the pin each would recompute the event-table
    // window from its own full scan+shuffle
    val tr = Staged.stage(events
      .withColumn("__next", lead(col(typeCol), 1).over(byUser))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("cur_type"), col("__next").as("next_type"))
      .agg(count(lit(1)).as("c")))
    val vocab = tr.select(col("cur_type").as("t"))
      .union(tr.select(col("next_type")))
      .agg(countDistinct(col("t")).as("__v"))
    val totals = tr.groupBy("cur_type").agg(sum("c").as("__t"))
    tr.join(broadcast(totals), "cur_type").crossJoin(broadcast(vocab))
      .select(col("cur_type"), col("next_type"), col("c"),
        graft.functions.Num.round4(
          (col("c") + lit(1.0)) / (col("__t") + col("__v"))).as("p_q4"))
  }

  /** The [[statusIntervals]] CURRENT-row read-off as a pure function
    * over one user's delivered event log — the same (ts, id) ordering
    * and change-collapse arithmetic, so a streaming monitor holding
    * the log as keyed state
    * ([[graft.streaming.EventStream.statusMonitor]]) reads off exactly
    * the batch query's `is_current = 1` row (status + valid_from) plus
    * the user's interval COUNT, over whatever prefix has been
    * delivered. Input tuples are (epoch-µs, event id, status). */
  /** Watermark planner: for each candidate watermark delay W, the
    * events a Structured-Streaming job would DROP as too-late —
    * measured on the micro-batch model the engine actually runs:
    * arrival is bucketed (a bucket ≈ one micro-batch; intra-batch
    * order is invisible to watermarking, which is exactly Spark's
    * semantics), the watermark is the running max event time over
    * PRIOR buckets, and an event drops iff its time sits more than W
    * behind that. The output table prices the latency/completeness
    * trade the `withWatermark` duration hard-codes: pick the W where
    * dropped_bp meets the pipeline's loss budget instead of copying
    * "10 minutes" from the docs (the q196/q199 measure-then-configure
    * discipline, applied to streaming).
    *
    * Exact integers end to end. Shape: one bucket-grain max aggregate
    * with map-side partials, the cumulative-max/lag window on the
    * BUCKET-domain table (ksDrift discipline), a co-partitioned join
    * back, and one aggregate per grid point over the staged joined
    * table — the corpus is touched once however long the grid. */
  def watermarkPlanner(events: DataFrame, bucketCol: Column, tsUsCol: Column,
                       gridSeconds: Seq[Long]): DataFrame = {
    require(gridSeconds.nonEmpty, "need at least one watermark candidate")
    val e = Staged.stage(events.select(bucketCol.as("__b"), tsUsCol.as("__us")))
    val wOrd = Window.orderBy("__b")
    val cm = e.groupBy("__b").agg(max("__us").as("__mx"))
      .withColumn("__cm",
        max("__mx").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__pm", lag(col("__cm"), 1).over(wOrd))
      .select("__b", "__pm")
    val joined = Staged.stage(e.join(cm, Seq("__b")))
    gridSeconds.map { w =>
      joined.agg(count(lit(1)).as("n_events"),
          sum(when(col("__us") < col("__pm") - lit(w * 1000000L), 1L)
            .otherwise(0L)).as("n_dropped"))
        .select(lit(w).cast("long").as("watermark_s"),
          col("n_events"), col("n_dropped"),
          expr("n_dropped * 10000 DIV n_events").as("dropped_bp"))
    }.reduce(_ unionByName _)
  }

  def currentStatusFromLog(log: Iterable[(Long, Long, String)])
      : (String, Long, Long) = {
    val s = log.toIndexedSeq.sortBy(e => (e._1, e._2))
    require(s.nonEmpty, "currentStatusFromLog needs at least one event")
    val cur = s.last._3
    var i = s.size - 1
    while (i > 0 && s(i - 1)._3 == cur) i -= 1
    val nIntervals = 1L + (1 until s.size).count(j => s(j)._3 != s(j - 1)._3)
    (cur, s(i)._1, nIntervals)
  }

  /** The [[rateAnomalies]] read-off for ONE bucket as a pure function
    * over a materialized bucket→count map — the SAME arithmetic (last
    * `trailing` observed buckets before it, exact integer z² test), so
    * a streaming monitor holding the map as keyed state
    * ([[graft.streaming.EventStream.rateMonitor]]) reads off exactly
    * what the batch query computes for that bucket. Returns None below
    * `minTrailing` (the batch query withholds those rows). */
  def anomalyReadingFromBuckets(buckets: Map[Long, Long], bucket: Long,
                                trailing: Int = 24, k2: Long = 9L,
                                minTrailing: Int = 6)
      : Option[(Long, Long, Long, Long, Long)] = {
    val n = buckets(bucket)
    val trail = buckets.keys.filter(_ < bucket).toSeq.sorted
      .takeRight(trailing).map(buckets)
    val w = trail.size.toLong
    if (w < minTrailing) None
    else {
      val s = trail.sum
      val q = trail.map(x => x * x).sum
      val dev = n * w - s
      val den = w * q - s * s
      Some((n, w, dev * dev, den, if (dev * dev > k2 * den) 1L else 0L))
    }
  }
}
