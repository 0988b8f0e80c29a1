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

  /** Pairwise source-distribution similarity: for every unordered pair
    * of groups, the HISTOGRAM INTERSECTION of their unigram
    * distributions — Σ_t min(p_a(t), p_b(t)), the total probability
    * mass the two sources agree on (Swain & Ballard 1991's measure;
    * 10⁴ bp = identical distributions, 0 = disjoint vocabularies) —
    * plus the vocabulary-set Jaccard. This is the mixture-redundancy
    * read beside q75's source-vs-corpus KL and q116's document-level
    * overlap: two sources that read ≥9000 bp here are near-duplicate
    * FEEDS (two crawls of the same site, two dumps of the same wiki),
    * and the mixture designer should merge or down-weight one before
    * q187 allocates budget to both.
    *
    * Exact end to end: with common denominators the intersection is
    *   Σ_t min(c_at·T_b, c_bt·T_a) · 10⁴ DIV (T_a·T_b)
    * — every term an exact integer product on DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB): at 100 TB c·T reaches ~10²⁵, far past 64 bits,
    * and the divisor T_a·T_b ~10²⁶ still fits 38 digits. No floats,
    * no per-engine division order.
    *
    * Shape: ONE corpus-grain (group, token) aggregate, staged — it
    * feeds the per-group totals, both sides of the token-grain pair
    * join, and nothing re-touches the corpus. The pair join fans out
    * ≤ #groups per token per side (bounded #groups² rows per token),
    * then aggregates to the pair grain; the #groups-row totals
    * broadcast onto it and the full pair GRID (so disjoint pairs
    * still emit a 0-bp row) is a broadcast of the group-domain table
    * against itself. Emits one row per pair a < b:
    * (source_a, source_b, vocab_a, vocab_b, n_shared_vocab,
    *  overlap_bp, jaccard_bp). */
  def profileOverlap(groupCol: String, textCol: String)
                    (docs: DataFrame): DataFrame = {
    val counts = Staged.stage(docs
      .select(col(groupCol).as("src"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("src", "tok").agg(count(lit(1)).as("c")))
    val totals = counts.groupBy("src").agg(
      sum(col("c").cast("decimal(38,0)")).as("t"),
      count(lit(1)).as("vocab"))
    val pairs = counts.select(col("src").as("src_a"), col("tok"),
        col("c").cast("decimal(38,0)").as("ca"))
      .join(counts.select(col("src").as("src_b"), col("tok"),
        col("c").cast("decimal(38,0)").as("cb")), Seq("tok"))
      .filter(col("src_a") < col("src_b"))
      .join(broadcast(totals.select(col("src").as("src_a"), col("t").as("ta"))), Seq("src_a"))
      .join(broadcast(totals.select(col("src").as("src_b"), col("t").as("tb"))), Seq("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"),
        sum(least(col("ca") * col("tb"), col("cb") * col("ta"))).as("inter"))
    val grid = totals.select(col("src").as("src_a"), col("t").as("ta"),
        col("vocab").as("vocab_a"))
      .crossJoin(broadcast(totals.select(col("src").as("src_b"),
        col("t").as("tb"), col("vocab").as("vocab_b"))))
      .filter(col("src_a") < col("src_b"))
    grid.join(broadcast(pairs), Seq("src_a", "src_b"), "left")
      .select(col("src_a").as("source_a"), col("src_b").as("source_b"),
        col("vocab_a"), col("vocab_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_vocab"),
        expr("cast(coalesce(inter, 0) * 10000 DIV (ta * tb) as bigint)")
          .as("overlap_bp"),
        expr("""cast(coalesce(n_shared, 0) * 10000
          DIV (vocab_a + vocab_b - coalesce(n_shared, 0)) as bigint)""")
          .as("jaccard_bp"))
  }

  /** Vocabulary growth curve (Heaps' law, Heaps 1978): cumulative
    * distinct-token count as the corpus grows in ingestion order
    * (`idCol` ascending), read off at `bucketSize`-document
    * checkpoints. Natural text grows vocabulary ≈ K·tokens^β with
    * β ≈ 0.4–0.6; a curve that keeps growing linearly means unbounded
    * token churn (random IDs, hashes — tokenizer poison), one that
    * flattens early means heavy repetition. This is the scaling read a
    * vocab-size decision extrapolates from.
    *
    * Cumulative-distinct does not decompose into window functions; the
    * scalable form is first-occurrence attribution: a token
    * contributes +1 exactly at its min-id document, so the curve is
    * the running sum of per-bucket first-occurrence counts. Emits one
    * exact-integer row per bucket:
    * (bucket, docs_so_far, cum_tokens, cum_vocab).
    *
    * Shape: one (token)-grain min aggregate and one bucket-grain token
    * count — both corpus-grain with map-side partials over the STAGED
    * token table (tokenized once) — then left joins and the cumulative
    * window over the bucket-grain table (corpus/bucketSize rows, the
    * ksDrift staging discipline; the doc spine rides a column-pruned
    * id-only scan). */
  def vocabGrowth(idCol: String, textCol: String, bucketSize: Long = 10)
                 (docs: DataFrame): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be positive: $bucketSize")
    val toks = Staged.stage(docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("__t")))
    val newV = toks.groupBy("__t").agg(min("__id").as("__fd"))
      .groupBy(expr(s"__fd DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("__new"))
    val tokB = toks.groupBy(expr(s"__id DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("__toks"))
    val docB = docs.groupBy(expr(s"`$idCol` DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("__docs"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    docB.join(tokB, Seq("bucket"), "left").join(newV, Seq("bucket"), "left")
      .select(col("bucket"),
        sum("__docs").over(w).as("docs_so_far"),
        sum(coalesce(col("__toks"), lit(0L))).over(w).as("cum_tokens"),
        sum(coalesce(col("__new"), lit(0L))).over(w).as("cum_vocab"))
  }
}
