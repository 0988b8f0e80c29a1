package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-distribution diagnostics — the corpus-health readings a
  * tokenizer/vocab decision consults alongside the coverage audit
  * (q105) and the drift monitor (q75). Natural text follows Zipf's law
  * (Zipf 1949; Piantadosi 2014): token frequency ≈ C/rank^α with
  * α ≈ 1. A per-source fit of α catches DEGENERATE sources before
  * they poison training: α far above 1 means a few tokens dominate
  * (boilerplate, log spam), α near 0 means a near-uniform vocabulary
  * (random strings, tables, minified code) — both outside the band
  * natural language occupies.
  *
  * Determinism: x = ln(rank) and y = ln(count) are ln-quantized to
  * ×10⁴ BIGINTs (the q129 discipline — ln differs by ulps across
  * engines, the quantized grid absorbs it), and the least-squares
  * slope is emitted as its EXACT integer numerator/denominator
  *   num = n·Σxy − Σx·Σy,   den = n·Σx² − (Σx)²
  * plus a ×10⁴ reading via sign-extracted positive-operand floor
  * division — no float arithmetic anywhere past the quantization, so
  * the fit itself hash-checks cross-engine (the q139/q141 "pin the
  * training loop" discipline applied to regression).
  *
  * Scale: the only corpus-grain stage is the (group, token) count
  * aggregate with map-side partials; the rank window runs per group
  * over the vocabulary-bounded count table with WindowGroupLimit
  * pruning from the rank ≤ topRanks cut, and the moment sums are one
  * more matrix-grain aggregate. Nothing joins, nothing fans out.
  */
object VocabStats {

  /** Per-group Zipf fit over the top `topRanks` token frequencies.
    * Output: (source, n_ranks, num, den, slope_q4) — slope_q4 is the
    * ×10⁴ least-squares slope of ln(count) on ln(rank), ≈ −10⁴·α;
    * NULL when the group has a single rank (den = 0, no fit exists). */
  def zipfSlopes(groupCol: String, textCol: String, topRanks: Int = 200)
                (docs: DataFrame): DataFrame = {
    require(topRanks >= 2, s"topRanks must be >= 2: $topRanks")
    val counts = docs
      .select(col(groupCol).as("source"), explode(tokens(col(textCol))).as("__t"))
      .groupBy("source", "__t").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("source").orderBy(col("__c").desc, col("__t"))
    val moments = counts
      .withColumn("__rn", row_number().over(w).cast("long"))
      .filter(col("__rn") <= topRanks)
      .select(col("source"),
        round(log(col("__rn").cast("double")) * 10000).cast("long").as("__x"),
        round(log(col("__c").cast("double")) * 10000).cast("long").as("__y"))
      .groupBy("source").agg(
        count(lit(1)).as("n_ranks"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    moments
      .withColumn("num",
        col("n_ranks") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("den",
        col("n_ranks") * col("__sxx") - col("__sx") * col("__sx"))
      .select(col("source"), col("n_ranks"), col("num"), col("den"),
        when(col("den") > 0,
          when(col("num") >= 0, expr("(num * 10000L) div den"))
            .otherwise(-expr("((-num) * 10000L) div den")))
          .as("slope_q4"))
  }
}
