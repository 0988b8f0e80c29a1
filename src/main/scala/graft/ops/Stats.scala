package graft.ops

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-level statistics for corpus monitoring: two-sample
  * drift testing and resampling-based uncertainty — the numbers a
  * data pipeline needs before declaring "source A changed" or "the
  * corpus mean is X ± ε".
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov distance between `valueCol`'s
    * distributions under two predicates, in EXACT integer arithmetic:
    * D = max_x |F_a(x) − F_b(x)| is emitted as the exact fraction
    * (d_num, d_den) = (max_x |cumA(x)·n_b − cumB(x)·n_a|, n_a·n_b)
    * plus basis points — no floats, no ties-handling ambiguity (the
    * sup over the pooled observed values IS the KS statistic for
    * step ECDFs). The classic drift alarm between two crawl sources
    * or two snapshot dates.
    *
    * Shape: one (value)-grain aggregate over both populations with
    * map-side partials (the only corpus-grain stage), then windows and
    * the max over the value-DOMAIN-sized matrix — fine for discrete /
    * pre-bucketed values (lengths, scores in bp, day keys); bucket
    * continuous values first. The final max is a single-row
    * aggregate. */
  def ksDrift(df: DataFrame, valueCol: String,
              inA: Column, inB: Column): DataFrame = {
    val perValue = df
      .select(col(valueCol).cast("long").as("v"),
        when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .where(col("a") === 1L || col("b") === 1L)
      .groupBy("v")
      .agg(sum("a").as("ca"), sum("b").as("cb"))
    // value-domain-sized matrix from here on; STAGED — the totals row
    // and the max both read it, and unstaged each would re-run the
    // corpus-grain aggregate
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val cum = Staged.stage(perValue
      .withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w)))
    // totals broadcast back: the row-wise |…| term needs n_a/n_b
    val totals = cum.agg(max("cuma").as("n_a"), max("cumb").as("n_b"))
    cum.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")).as("__d"))
      .groupBy("n_a", "n_b")
      .agg(max("__d").as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        (col("n_a") * col("n_b")).as("d_den"),
        expr("d_num * 10000 DIV (n_a * n_b)").as("d_bp"))
  }

  /** The [[ksDrift]] read-off as a pure function over two
    * value→count histograms — the same pooled-values ECDF sup in the
    * same exact integer arithmetic, so a streaming monitor holding a
    * histogram as keyed state
    * ([[graft.streaming.CorpusStream.driftMonitor]]) reads off exactly
    * what the batch query computes over the same two populations
    * (live ≡ batch, pinned by `StatsSpec`). Returns
    * (n_a, n_b, d_num, d_den, d_bp); empty sides give a zero
    * denominator and d_bp 0. */
  def ksFromHistograms(a: Map[Long, Long],
                       b: Map[Long, Long]): (Long, Long, Long, Long, Long) = {
    val vals = (a.keySet ++ b.keySet).toSeq.sorted
    val na = a.values.sum
    val nb = b.values.sum
    var ca = 0L; var cb = 0L; var d = 0L
    vals.foreach { v =>
      ca += a.getOrElse(v, 0L)
      cb += b.getOrElse(v, 0L)
      d = math.max(d, math.abs(ca * nb - cb * na))
    }
    val den = na * nb
    (na, nb, d, den, if (den == 0L) 0L else d * 10000L / den)
  }

  /** Poisson bootstrap confidence interval for the mean of an integer
    * `valueCol`: each of `b` replicas weights every row by a
    * DETERMINISTIC Poisson(1) draw derived from md5(id, replica) —
    * the one-pass resampling scheme that works at any scale because it
    * never materializes an index-based resample — and the CI is the
    * exact order-statistic quantile pair of the replica means. Replica
    * sums are exact integers (weight · value); only the final
    * mean divisions and the quantile read-off touch doubles, and both
    * engines fold them identically.
    *
    * Shape: the b-way fan-out is the only corpus-grain stage
    * (rows × b), aggregating map-side to b replica rows; the quantile
    * window runs over the b-row matrix. Emits one row:
    * (mean_q4, lo_q4, hi_q4, n_replicas). */
  def poissonBootstrapCi(df: DataFrame, idCol: String, valueCol: String,
                         b: Int = 200, loRank: Int = 5,
                         hiRank: Int = 196): DataFrame = {
    require(b >= 2, s"need at least 2 replicas, got $b")
    require(loRank >= 1 && hiRank <= b && loRank < hiRank,
      s"bad ranks [$loRank, $hiRank] for b=$b")
    // u ∈ [0,1): first 12 md5 hex digits / 16^12; Poisson(1) inverse
    // CDF thresholds as exact decimal literals (both engines parse the
    // same doubles)
    val u = expr(
      s"CAST(conv(substring(md5(concat(CAST(`$idCol` AS STRING), '|', " +
        "CAST(__b AS STRING))), 1, 12), 16, 10) AS DOUBLE) / 281474976710656.0")
    val pois = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .otherwise(5L)
    val reps = df
      .select(col(idCol), col(valueCol).cast("long").as("__x"))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__w", pois)
      .groupBy("__b")
      .agg(sum(col("__w") * col("__x")).as("__s"), sum("__w").as("__n"))
      .where(col("__n") > 0L)
      .select((col("__s") * lit(1.0) / col("__n")).as("__m"))
    val ranked = reps
      .withColumn("__rk", row_number().over(Window.orderBy("__m")))
    val point = df.agg(
      (sum(col(valueCol).cast("long")) * lit(1.0) / count(lit(1))).as("__pm"))
    ranked.crossJoin(broadcast(point))
      .agg(
        Num.round4(max(col("__pm"))).as("mean_q4"),
        Num.round4(max(when(col("__rk") === loRank, col("__m")))).as("lo_q4"),
        Num.round4(max(when(col("__rk") === hiRank, col("__m")))).as("hi_q4"),
        count(lit(1)).as("n_replicas"))
  }

  /** Exact tie-aware ROC AUC of an integer `scoreCol` against a 0/1
    * `labelCol`, via the Mann–Whitney U statistic in EXACT integer
    * arithmetic: AUC = U / (n₁·n₀) where
    * U = #(pos-score > neg-score) + ½·#(ties). Doubling clears the ½:
    * auc_num = 2U = Σ_s c₁(s)·(2·cum₀(<s) + c₀(s)), auc_den = 2·n₁·n₀
    * — no ranks, no floats, no tie ambiguity. The threshold-free
    * ranking-quality number for a quality classifier (q165's κ scores
    * the binarized gate; this scores the whole ordering).
    *
    * Shape: one score-grain aggregate with map-side partials (the only
    * corpus-grain stage), then a cumulative window + single-row
    * aggregate over the score-DOMAIN-sized table — the [[ksDrift]]
    * staging discipline. Emits one row:
    * (n_pos, n_neg, auc_num, auc_den, auc_bp); auc_bp is null when a
    * class is empty (AUC is undefined, not 0). */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s")
      .agg(sum("y").as("c1"), (count(lit(1)) - sum("y")).as("c0"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cum0", coalesce(sum("c0").over(w), lit(0L)))
      .agg(sum("c1").as("n_pos"), sum("c0").as("n_neg"),
        sum(col("c1") * (col("cum0") * 2L + col("c0"))).as("auc_num"))
      .select(col("n_pos"), col("n_neg"), col("auc_num"),
        (col("n_pos") * col("n_neg") * 2L).as("auc_den"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
          ELSE auc_num * 10000 DIV (2 * n_pos * n_neg) END""").as("auc_bp"))
  }

  /** Precision/recall threshold sweep for an integer `scoreCol` against
    * a 0/1 `labelCol`: one row per DISTINCT score value `thresh`, with
    * the confusion counts and basis-point precision / recall / F1 of
    * the rule "predict positive iff score ≥ thresh" — the
    * cutoff-selection table next to [[aucExact]]'s threshold-free
    * summary (AUC says the ranking is good; this says WHERE to cut it
    * and what each cut costs). All exact integers: tp/fp are the
    * descending cumulative class counts at the threshold, F1 in basis
    * points is 2·tp·10⁴ DIV (2·tp + fp + fn) — denominators are
    * positive at every emitted row because thresh is an observed score
    * (tp + fp ≥ 1).
    *
    * Shape: one score-grain aggregate with map-side partials (the only
    * corpus-grain stage), then the descending cumulative window over
    * the score-DOMAIN-sized table — the [[ksDrift]]/[[aucExact]]
    * staging discipline. `recall_bp` is null when there are no
    * positives at all. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .select(col(scoreCol).cast("long").as("thresh"),
        col(labelCol).cast("long").as("y"))
      .groupBy("thresh")
      .agg(sum("y").as("c1"), (count(lit(1)) - sum("y")).as("c0"))
    val desc = Window.orderBy(col("thresh").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.orderBy(col("thresh").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perScore
      .withColumn("tp", sum("c1").over(desc))
      .withColumn("fp", sum("c0").over(desc))
      .withColumn("n_pos", sum("c1").over(all))
      .withColumn("n_neg", sum("c0").over(all))
      .select(col("thresh"), col("tp"), col("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n_neg") - col("fp")).as("tn"),
        expr("tp * 10000 DIV (tp + fp)").as("precision_bp"),
        expr("CASE WHEN n_pos = 0 THEN NULL ELSE tp * 10000 DIV n_pos END")
          .as("recall_bp"),
        expr("2 * tp * 10000 DIV (2 * tp + fp + (n_pos - tp))").as("f1_bp"))
  }

  /** Exact Pearson correlation between two integer columns, emitted as
    * the EXACT rational pieces plus a signed ×10⁴ r² reading:
    *   r_num  = n·Σxy − Σx·Σy
    *   r_den_x = n·Σx² − (Σx)²,   r_den_y = n·Σy² − (Σy)²
    *   r2_bp  = sign(r_num) · (r_num²·10⁴ DIV (r_den_x·r_den_y))
    * — r² avoids the square root (no integer sqrt exists with
    * cross-engine ulp parity), the sign is factored out before the
    * positive-operand floor division (the kappa/zipf discipline), and
    * r2_bp is NULL when either column is constant (r undefined, not 0).
    * The bias audit for any scored pipeline stage: corr(score, length)
    * far from 0 means the "quality" signal is substantially a length
    * proxy.
    *
    * Arithmetic rides DECIMAL(38,0) on the Spark side (DuckDB sums
    * BIGINTs into HUGEINT automatically): with |x|,|y| ≤ 10⁵ and
    * n ≤ 10⁹ the moments fit 64 bits but r_num² does not — the
    * decimal path keeps the whole computation exact on both engines.
    * One aggregate with map-side partials; a single output row. */
  def corrExact(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .select(
        col("__n").cast("long").as("n"),
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).as("__num"),
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).as("__dx"),
        (col("__n") * col("__syy") - col("__sy") * col("__sy")).as("__dy"))
      .select(col("n"),
        col("__num").cast("long").as("r_num"),
        col("__dx").cast("long").as("r_den_x"),
        col("__dy").cast("long").as("r_den_y"),
        expr("""CASE WHEN __dx = 0 OR __dy = 0 THEN NULL
          WHEN __num >= 0
            THEN CAST((__num * __num * 10000) DIV (__dx * __dy) AS BIGINT)
          ELSE -CAST((__num * __num * 10000) DIV (__dx * __dy) AS BIGINT)
          END""").as("r2_bp"))
  }

  /** Chi-squared homogeneity of `colCol`'s distribution across
    * `rowCol`'s groups (Pearson 1900), with Cramér's V² as the
    * size-free effect reading: per grid cell
    *   term_bp = (O·N − rowTot·colTot)²·10⁴ DIV (rowTot·colTot·N)
    * — the exact ×10⁴ value of (O−E)²/E with the expectation's
    * division never performed (cross-multiplied away), each cell
    * floor-divided once (deterministic on both engines; chi2_bp is
    * within n_cells/10⁴ of the real statistic, always from below) and
    * summed over the FULL observed-category grid including structural
    * zeros (O = 0 cells carry E²/E = E). v2_bp = chi2_bp DIV
    * (N·min(nr−1, nc−1)) is Cramér's V² in basis points — the
    * corpus-audit number ("how far from homogeneous is the language
    * mix across sources") that doesn't grow with N the way χ² does.
    * One row: (n, n_rows, n_cols, dof, chi2_bp, v2_bp); v2_bp NULL
    * for a degenerate 1×c / r×1 table.
    *
    * Shape: one (row, col)-grain corpus aggregate with map-side
    * partials; margins, the grid completion (tiny × tiny cross join),
    * and the final sum all work the category-domain-sized matrix.
    * Arithmetic rides DECIMAL(38,0) / HUGEINT — (O·N)² needs ~2·63
    * bits long before any output column does. */
  def chi2Homogeneity(df: DataFrame, rowCol: String,
                      colCol: String): DataFrame = {
    val obs = Staged.stage(df
      .groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o")))
    val rt = obs.groupBy("r").agg(sum("o").as("rt"))
    val ct = obs.groupBy("c").agg(sum("o").as("ct"))
    val tot = obs.agg(sum("o").as("n"), count(lit(1)).as("__nobs"))
      .select(col("n"))
    val dims = rt.agg(count(lit(1)).as("n_rows"))
      .crossJoin(ct.agg(count(lit(1)).as("n_cols")))
    val cells = rt.crossJoin(ct)
      .join(obs, Seq("r", "c"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST(((CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)
          | * (CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)
          | * 10000) DIV (CAST(rt AS DECIMAL(38,0)) * ct * n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("__term_bp"),
        col("n"))
    cells.groupBy("n").agg(sum("__term_bp").as("chi2_bp"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("n_rows"), col("n_cols"),
        ((col("n_rows") - 1L) * (col("n_cols") - 1L)).as("dof"),
        col("chi2_bp"),
        expr("""CASE WHEN n_rows < 2 OR n_cols < 2 THEN NULL
          ELSE chi2_bp DIV (n * least(n_rows - 1, n_cols - 1)) END""")
          .as("v2_bp"))
  }

  /** Robust per-group location/spread of an integer column: the exact
    * LOWER median (order statistic ⌈n/2⌉ — no midpoint averaging, so
    * the reading is always an observed value and always an integer)
    * and the median absolute deviation around it, computed the same
    * way. The outlier-immune reading beside the mean: one pathological
    * document moves a mean arbitrarily; it moves the median by at most
    * one order statistic — the robustness a length/quality audit needs
    * when a crawl source occasionally emits megabyte blobs.
    *
    * Shape: one (group, value)-grain corpus aggregate with map-side
    * partials, then per-group cumulative windows over the value-DOMAIN
    * table to read the order statistic; the deviation pass reuses the
    * SAME staged count table (|v − med| regroups values, never rows)
    * — the corpus is touched once. Output:
    * (group, n, median, mad). */
  def robustStats(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val counts = Staged.stage(df
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c")))
    def lowerMedian(t: DataFrame, out: String): DataFrame = {
      val w = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = Window.partitionBy("g")
      t.withColumn("__cum", sum("c").over(w))
        .withColumn("__n", sum("c").over(tot))
        .where(col("__cum") * 2L >= col("__n"))
        .groupBy("g").agg(min("v").as(out), max("__n").as("__gn"))
    }
    val med = lowerMedian(counts, "median")
    val devs = counts.join(med, "g")
      .select(col("g"), abs(col("v") - col("median")).as("v"), col("c"))
      .groupBy("g", "v").agg(sum("c").as("c"))
    lowerMedian(devs, "mad")
      .select(col("g"), col("mad"))
      .join(med, "g")
      .select(col("g").as(groupCol), col("__gn").as("n"),
        col("median"), col("mad"))
  }

  /** Exact Gini coefficient of a non-negative integer column — the
    * concentration audit ("how much of the corpus' mass sits in its
    * biggest members"): 0 = perfectly even, →1 = one member holds
    * everything. Computed from the VALUE HISTOGRAM, not per-row ranks:
    * items sharing value v occupy a contiguous rank block, so their
    * rank-weighted sum is v·(2·c·cum_prev + c·(c+1)) — summing that
    * over the value domain gives 2·Σᵢ i·x₍ᵢ₎ exactly, ties handled by
    * construction, and
    *   gini_num = 2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx,   gini_den = n·Σx
    * emitted as the exact rational plus ×10⁴ basis points. NULL when
    * total mass is zero (Gini undefined).
    *
    * Shape: one value-grain corpus aggregate with map-side partials,
    * a cumulative window over the value-DOMAIN table, one single-row
    * aggregate — the [[ksDrift]] staging. DECIMAL(38,0) keeps
    * rank·value products exact past the 64-bit ceiling. */
  def giniExact(df: DataFrame, valueCol: String): DataFrame = {
    val perValue = df
      .select(col(valueCol).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    perValue
      .withColumn("__cp", coalesce(sum("c").over(w), lit(0L)))
      .select(
        col("c").cast("decimal(38,0)").as("__c"),
        col("v").cast("decimal(38,0)").as("__v"),
        col("__cp").cast("decimal(38,0)").as("__cp"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__v") * col("__c")).as("__t"),
        sum(col("__v") * (col("__c") * col("__cp") * 2 +
          col("__c") * (col("__c") + 1))).as("__s2"))
      .select(col("__n").cast("long").as("n"),
        col("__t").cast("long").as("total"),
        (col("__s2") - (col("__n") + 1) * col("__t")).cast("long")
          .as("gini_num"),
        (col("__n") * col("__t")).cast("long").as("gini_den"),
        expr("""CASE WHEN __t = 0 THEN NULL
          ELSE CAST(((__s2 - (__n + 1) * __t) * 10000) DIV (__n * __t)
            AS BIGINT) END""").as("gini_bp"))
  }
}
