package graft.ops

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch summaries whose STATE is plain relational data —
  * the hash-verifiable members of the sketch family, next to the
  * engine-private ones (q49's HLL / approx_percentile, q121's KMV
  * pattern). A fixed-width histogram is the simplest mergeable
  * quantile sketch there is: partial bin counts add associatively
  * (map-side combine does the merging), state is #bins longs however
  * large the input, and the quantile read-off is deterministic integer
  * arithmetic plus one final division — so unlike a t-digest/GK sketch
  * the whole thing reproduces bit-identically in any engine.
  */
object Sketches {

  /** Histogram-sketch quantile estimates of `valueCol` per `keyCol`
    * group: bins of `binWidth`, estimates for each q in `qs` by linear
    * interpolation inside the target bin (position ⌈q·N⌉, the
    * percentile-disc rank). Output: (key, q, n, est 4dp).
    *
    * Error bound: an estimate is off by at most `binWidth` — the knob
    * trades state size (#bins = max/width) against accuracy, the same
    * contract as approx_percentile's `accuracy`, but with mergeable
    * relational state and an exact cross-engine read-off.
    *
    * Shape: ONE corpus-grain shuffle — the (key, bin) groupBy with
    * map-side partials; every window below it runs over the
    * #keys × #bins matrix, never the input. */
  def histogramQuantiles(keyCol: String, valueCol: Column,
                         binWidth: Long = 16L,
                         qs: Seq[Double] = Seq(0.5, 0.9, 0.99))
                        (df: DataFrame): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles: $qs")
    val hist = df
      .select(col(keyCol), (valueCol.cast("double") / binWidth)
        .cast("long").as("__bin"))
      .groupBy(keyCol, "__bin").agg(count(lit(1)).as("__cnt"))
    val byKey = Window.partitionBy(keyCol)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(byKey.orderBy("__bin")))
      .withColumn("__n", sum(col("__cnt")).over(byKey))
    cum
      .select(col(keyCol), col("__bin"), col("__cnt"), col("__cum"), col("__n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("__pos", ceil(col("q") * col("__n")).cast("long"))
      // exactly one row per (key, q): the first bin whose cumulative
      // count reaches the target position
      .filter(col("__cum") >= col("__pos") &&
        col("__cum") - col("__cnt") < col("__pos"))
      .select(col(keyCol), col("q"), col("__n").cast("long").as("n"),
        Num.round4(col("__bin") * binWidth +
          ((col("__pos") - (col("__cum") - col("__cnt"))) * (binWidth * 1.0)) /
            col("__cnt")).as("est"))
  }

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) frequency
    * estimates — the FREQUENCY member of the hash-verifiable sketch
    * trio (KMV → distinct count, fixed-bin histogram → quantiles, CMS
    * → per-item frequency). The sketch is a d×w counter matrix; merge
    * is matrix ADDITION — commutative and associative, so unlike
    * Misra–Gries the state is order-independent and the whole sketch
    * reproduces bit-identically in any engine. Hash rows use
    * md5(i ‖ token) → 48-bit value mod w (the q121 public-hash
    * discipline), so DuckDB rebuilds the same matrix.
    *
    * Estimate(t) = min over the d rows of counter[i][h_i(t)] — an
    * upper bound on the true count, off only by collisions (≤ εN with
    * w = ⌈e/ε⌉ at confidence 1−(1/2)^d). Output per probe term:
    * (term, n_true, cms_est, overestimate) — the exact count is the
    * audit column; drop it in production and the query never groups by
    * token, only by the d×w bounded cells.
    *
    * Shape: one corpus-grain explode aggregating map-side into ≤ d·w
    * cells; probes are a #terms-row broadcast joined against the tiny
    * matrix. */
  def cmsFrequency(textCol: Column, probeTerms: Seq[String],
                   d: Int = 4, w: Int = 64)(df: DataFrame): DataFrame = {
    require(d > 0 && w > 0, s"bad sketch dims d=$d w=$w")
    require(probeTerms.nonEmpty, "need at least one probe term")
    import df.sparkSession.implicits._
    val toks = Staged.stage(df
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("__t")))
    def cell(i: Int, t: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"$i|"), t)), 1, 12), 16, 10)
        .cast("long"), lit(w.toLong))
    val rows = toks.select(col("__t"),
        explode(array((0 until d).map(i =>
          struct(lit(i).as("i"), cell(i, col("__t")).as("c"))): _*)).as("__rc"))
      .groupBy(col("__rc.i").as("i"), col("__rc.c").as("c"))
      .agg(count(lit(1)).as("n"))
    val exact = toks.filter(col("__t").isin(probeTerms: _*))
      .groupBy(col("__t").as("term")).agg(count(lit(1)).as("n_true"))
    val probes = probeTerms.toDF("term")
      .select(col("term"),
        explode(array((0 until d).map(i =>
          struct(lit(i).as("i"), cell(i, col("term")).as("c"))): _*)).as("__rc"))
      .select(col("term"), col("__rc.i").as("i"), col("__rc.c").as("c"))
    probes.join(rows, Seq("i", "c"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
      .join(exact, Seq("term"), "left")
      .select(col("term"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        col("cms_est"),
        (col("cms_est") - coalesce(col("n_true"), lit(0L))).as("overestimate"))
  }

  /** The CMS cell index as a pure function — the EXACT arithmetic of
    * [[cmsFrequency]]'s `cell` column (md5 of "i|token", first 12 hex
    * chars as a 48-bit non-negative long, mod w), so a streaming
    * monitor holding the d×w counter matrix as keyed state
    * ([[graft.streaming.CorpusStream.frequencyMonitor]]) fills and
    * reads the IDENTICAL sketch the batch query builds. */
  def cmsCell(i: Int, token: String, w: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i|$token".getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % w).toInt
  }

  /** Min-over-rows read-off of a row-major d×w counter state for one
    * term — [[cmsFrequency]]'s `min(coalesce(n, 0))` as a pure
    * function over materialized state. */
  def cmsEstimateFromState(state: Array[Long], d: Int, w: Int,
                           term: String): Long = {
    require(state.length == d * w, s"state ${state.length} != $d*$w")
    (0 until d).map(i => state(i * w + cmsCell(i, term, w))).min
  }

  /** The [[histogramQuantiles]] read-off as a pure driver-side function
    * over a materialized bin→count map — the SAME arithmetic
    * (⌈q·N⌉ rank, in-bin linear interpolation, 4dp round with the
    * signed-zero collapse), so a streaming monitor holding the map as
    * keyed state ([[graft.streaming.CorpusStream.lengthQuantileMonitor]])
    * reads off exactly what the batch query computes. */
  def estimateFromBins(bins: Map[Long, Long], binWidth: Long, q: Double): Double = {
    require(bins.nonEmpty, "empty histogram")
    val n = bins.valuesIterator.sum
    val pos = math.ceil(q * n).toLong
    var cum = 0L
    for ((bin, cnt) <- bins.toSeq.sorted) {
      if (cum + cnt >= pos && cum < pos) {
        val raw = bin * binWidth + ((pos - cum) * (binWidth * 1.0)) / cnt
        // Spark's round(x, 4) is BigDecimal HALF_UP — match it exactly,
        // then the Num.round4 signed-zero collapse
        return BigDecimal(raw)
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0
      }
      cum += cnt
    }
    throw new IllegalStateException(s"rank $pos beyond histogram mass $n")
  }
}
