package graft.ops

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based sampling (`df.sample`) is replay-hostile at scale: results
  * depend on partition layout and task retries. Hash-prefix sampling
  * decides per ROW from stable content (the id), so the same row lands in
  * the same split on every run, on any cluster, at any partitioning —
  * the property curriculum/mixture pipelines need when they re-derive a
  * sample across snapshots. No shuffle: the decision is a scan-level
  * filter that pushes down beside the other predicates.
  */
object Sampling {

  /** Hex threshold for a [0,1] rate at 2-hex-digit (1/256) granularity.
    * A rate that rounds to 256 must compare above EVERY 2-hex-digit
    * bucket: "100" would sort below "11".."ff" lexicographically, so the
    * keep-all sentinel is "g" ('g' > 'f' > '9'). */
  private[ops] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0,1]")
    val n = math.round(rate * 256).min(256)
    if (n >= 256) "g" else f"$n%02x"
  }

  /** The sampling key: first two hex chars of md5 of the id rendered as a
    * string — portable across engines (DuckDB computes the identical
    * digest, unlike xxhash64), uniform, and independent of row order. */
  def hashBucket(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2)

  /** Keep a row iff its hash bucket falls under its stratum's threshold.
    * `rates` maps stratum values to sampling rates (granularity 1/256);
    * unlisted strata use `defaultRate`. Deterministic, idempotent, and
    * exactly reproducible by any engine that can compute md5. Because the
    * keep-set at rate r is `bucket < threshold(r)`, samples are NESTED:
    * raising a rate only ever ADDS rows — the consistency property
    * mixture/curriculum pipelines rely on when re-weighting a source. */
  def stratifiedByHash(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val thresh = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < thresh)
  }

  /** Assign every row to exactly one named split (train/val/test …) by
    * cumulative hash-threshold ranges. Assignment is a pure function of
    * the id: stable across runs, engines, partitionings, and corpus
    * growth (a doc never migrates between splits when new docs arrive —
    * the property that keeps eval sets uncontaminated). `splits` rates
    * must sum to 1; granularity is 1/256. */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split rates must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val bucket = hashBucket(col(idCol))
    val assign = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), c)) =>
          when(bucket < lit(hexThreshold(c)), name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Uniform [0,1) hash fraction from the first 16 bits of md5 of the id
    * rendered as a string — the finer-grained (1/65536) numeric twin of
    * [[hashBucket]], portable to any engine that parses hex (DuckDB:
    * `('0x' || substr(md5(x), 1, 4))::BIGINT / 65536.0`). */
  def hashFraction(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("double") / 65536.0

  /** Mixture building, step 1: sample each source down to a WEIGHT
    * budget (tokens, chars, bytes — any additive column; null weights
    * count as 0). The per-source keep rate is min(1, budget /
    * total_weight); rows keep or drop by a SALTED [[hashFraction]] of
    * their id — the salt decorrelates this decision from
    * [[splitByHash]]/[[stratifiedByHash]] on the same id (which read the
    * unsalted hash; composing with them unsalted would bias the kept
    * fraction by the upstream keep rate). The sample stays deterministic,
    * replayable, and NESTED across budget changes (raising a budget only
    * adds rows). Sources without a budget — including a null source —
    * are kept in full; a source whose total weight is 0 has nothing to
    * budget and is kept in full too.
    *
    * Scale: one tiny per-source aggregate (rows = #sources) broadcast
    * back; the keep decision is then a scan-level filter — no shuffle of
    * the corpus itself. Budgets are hit in expectation (hash sampling),
    * which is how mixture specs are stated at corpus scale. */
  def tokenBudgetSample(df: DataFrame, idCol: String, sourceCol: String,
                        weightCol: String,
                        budgets: Map[String, Long]): DataFrame = {
    val totals = df.groupBy(sourceCol)
      .agg(sum(coalesce(col(weightCol), lit(0L))).as("__total"))
    val budget = budgets.foldLeft(lit(null).cast("double")) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b.toDouble)).otherwise(acc)
    }
    // left join: a null source never equi-matches its totals row — it
    // must still flow through (budget is null there → rate 1.0)
    df.join(broadcast(totals), Seq(sourceCol), "left")
      .withColumn("__rate", when(budget.isNull || !(col("__total") > 0), lit(1.0))
        .otherwise(least(lit(1.0), budget / col("__total"))))
      .filter(hashFraction(concat(lit("budget:"), col(idCol).cast("string")))
        < col("__rate"))
      .drop("__total", "__rate")
  }

  /** Mixture building, step 2: deterministic fractional upsampling —
    * repeat each row per its source's epoch factor (e.g. 2.5 = every row
    * twice, half the rows a third time). The fractional copy is decided
    * by [[hashFraction]] of a salted id (independent of any sampling
    * decision on the same id), so the blow-up is exact in expectation
    * and replayable row-by-row. Factors below 1 downsample (0 copies for
    * the unlucky fraction). Adds `rep` (0-based copy index, long) so
    * (id, rep) stays a key for downstream shuffling/sharding.
    *
    * Scale: a per-row explode of at most ceil(factor) elements — no
    * shuffle; the output size is the mixture's intended token count. */
  def repeatByFactor(df: DataFrame, idCol: String, sourceCol: String,
                     factors: Map[String, Double],
                     defaultFactor: Double = 1.0): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(_ >= 0.0),
      "repeat factors must be non-negative")
    val f = factors.foldLeft(lit(defaultFactor)) {
      case (acc, (s, x)) => when(col(sourceCol) === s, lit(x)).otherwise(acc)
    }
    val base = floor(f).cast("long")
    val extra = (hashFraction(concat(lit("rep:"), col(idCol).cast("string")))
      < (f - floor(f))).cast("long")
    df.withColumn("__n", base + extra)
      .filter(col("__n") > 0)
      .withColumn("rep", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Sequence packing: the concat-and-chunk layout a training run uses to
    * turn variable-length documents into fixed-`seqLen`-token rows with
    * no padding waste. Documents first get the deterministic
    * [[shuffleShards]] order (pos, shard), then each shard lays its
    * documents end-to-end: `offset` is the document's starting token
    * position within its shard's stream, `bin` = offset / seqLen is the
    * training sequence its first token lands in (documents may straddle
    * a bin boundary — standard concat-then-chunk packing, zero padding).
    *
    * Scale: the running total is a window partitioned BY SHARD — nShards
    * independent cumulative sums, each a single sorted partition, never
    * one global single-partition window. A 100 TB run sizes nShards to
    * the cluster's parallelism (thousands), so each shard's stream is a
    * few GB and the sort stays in-memory; the shuffle it pays (hash by
    * shard) is the same one the sharded write needs anyway. Adds `pos`,
    * `shard` (from [[shuffleShards]]) plus `offset` and `bin` (long). */
  def packSequences(idCol: String, nTokensCol: String, seqLen: Int,
                    nShards: Int, seed: String = "")
                   (df: DataFrame): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("pos")
    shuffleShards(idCol, nShards, seed)(df)
      .withColumn("offset", sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("bin", floor(col("offset").cast("double") / seqLen).cast("long"))
  }

  /** Per-stratum quota cap: keep at most `quota` rows per stratum value
    * — the "at most N documents per domain" anti-spam rule of web-corpus
    * builds (a RATE can't express it: the cap must bind only the
    * over-represented strata). Which rows survive is decided by md5 hash
    * order (id tiebreak), so the kept set is deterministic, engine-
    * portable, and stable under reruns — and under corpus growth an
    * already-kept row is only ever displaced by a hash-smaller newcomer,
    * never by reordering.
    *
    * Scale: row_number windows BY STRATUM — parallel across strata, and
    * the one hash Exchange carries only the rows themselves. A stratum
    * hot enough to skew its window task is exactly the stratum the quota
    * truncates; for pathological single-domain corpora, pre-filter with
    * [[stratifiedByHash]] at rate ≈ quota/estimate first, then apply the
    * exact cap to the survivors. */
  def quotaPerStratum(df: DataFrame, idCol: String, strataCol: String,
                      quota: Int): DataFrame = {
    require(quota > 0, s"quota $quota must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__qrn", row_number().over(w))
      .filter(col("__qrn") <= quota)
      .drop("__qrn")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much its hashed n-gram features look like a TARGET
    * distribution (here: the rows matching `targetPred`) versus the raw
    * pool — the principled replacement for hand-tuned quality filters
    * when a trusted exemplar corpus exists. Features are unigram +
    * bigram occurrences hashed into `nBuckets` buckets (md5 — engine-
    * portable like [[hashFraction]]); bucket probabilities are Laplace-
    * smoothed (+1, so target-absent buckets stay finite); the document
    * weight is Σ log(p_target(b)/p_raw(b)) over its feature occurrences.
    *
    * Cross-engine determinism: each bucket's log-ratio is quantized to a
    * ×10⁴ BIGINT before the per-document sum — integer sums are
    * order-independent where float sums are not (the q99 discipline) —
    * and `weight_q` is that exact integer (dsir_weight = weight_q/10⁴
    * for reading). Downstream selection (top-n, resampling thresholds)
    * must order on (weight_q, id).
    *
    * Scale: two map-side-partial bucket aggregates (rows ≤ nBuckets) +
    * one broadcast of the nBuckets-row ratio table back onto the
    * exploded features; shuffles carry (doc, bucket)-level rows, never
    * documents. Output: (idCol, n_feats, weight_q, dsir_weight). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets $nBuckets out of (0, 65536] (bucketing reads 4 hex chars)")
    val toks = df.select(col(idCol).as("__did"), targetPred.as("__tgt"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("__w"))
    val feats = Staged.stage(toks
      .select(col("__did"), col("__tgt"),
        explode(concat(col("__w"),
          graft.functions.TextFunctions.bigrams(col("__w")))).as("__f"))
      .withColumn("__b",
        conv(substring(md5(col("__f")), 1, 4), 16, 10).cast("long") % nBuckets)
      .drop("__f"))
    val rawCnt = feats.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val tgtCnt = feats.filter(col("__tgt")).groupBy("__b").agg(count(lit(1)).as("__ct"))
    val totals = feats.agg(count(lit(1)).as("__R"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__T"))
    // every bucket a document can hit is present in rawCnt by
    // construction; target-absent buckets coalesce to the smoothing floor
    val ratios = rawCnt.join(tgtCnt, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        round(log(((coalesce(col("__ct"), lit(0L)) + 1.0) / (col("__T") + nBuckets))
          / ((col("__cr") + 1.0) / (col("__R") + nBuckets))) * 10000)
          .cast("long").as("__lw"))
    feats.join(broadcast(ratios), "__b")
      .groupBy(col("__did"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("__lw")).as("weight_q"))
      .select(col("__did").as(idCol), col("n_feats"), col("weight_q"),
        Num.roundz(col("weight_q") / 10000.0, 4).as("dsir_weight"))
  }

  /** Temperature (α) mixture sampling: per-stratum quotas proportional
    * to n_s^α — the standard rebalancing rule for skewed multilingual /
    * multi-source corpora (α = 1 keeps the natural mix, α → 0 approaches
    * uniform; training mixes typically run α ∈ [0.3, 0.7]). Each
    * stratum's quota is `min(n_s, max(1, floor(budget · n_s^α / Σ
    * n_t^α)))` — over-represented strata are squashed, tail strata keep
    * at least one row — and the survivors are the quota hash-smallest
    * rows per stratum ([[quotaPerStratum]]'s discipline), so the kept
    * set is deterministic, engine-portable, and NESTED in the budget
    * (quotas grow monotonically with budget and the per-stratum order is
    * fixed, so raising the budget only adds rows).
    *
    * Cross-engine note: the scaled weight is rounded to 4dp BEFORE the
    * floor — n^α and the float Σ are the only non-integer inputs, and
    * the round keeps both engines' last-ulp pow/summation differences
    * from flipping the integer cut.
    *
    * Scale: the counts aggregate is map-side partial (rows = #strata),
    * quotas broadcast back, and the one corpus Exchange is the
    * by-stratum window hash — identical to [[quotaPerStratum]]. */
  def temperatureQuota(df: DataFrame, idCol: String, strataCol: String,
                       alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha out of (0,1]")
    require(budget > 0, s"budget $budget must be positive")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val z = counts.agg(sum(pow(col("__n").cast("double"), alpha)).as("__z"))
    val quotas = counts.crossJoin(broadcast(z))
      .withColumn("__quota", least(col("__n"), greatest(lit(1L),
        floor(round(lit(budget.toDouble) * pow(col("__n").cast("double"), alpha)
          / col("__z"), 4)).cast("long"))))
      .select(col(strataCol), col("__quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("__qrn", row_number().over(w))
      .filter(col("__qrn") <= col("__quota"))
      .drop("__qrn", "__quota")
  }

  /** Weighted sample WITHOUT replacement, k rows, inclusion probability
    * proportional to `weightCol` — Efraimidis & Spirakis (2006,
    * "Weighted random sampling with a reservoir"): each row draws
    * u ∈ (0,1] and the k largest u^(1/w) win. We rank on the
    * monotone-equivalent key ln(u)/w (u ≤ 1 ⇒ key ≤ 0; larger weight
    * pulls the key toward 0), which avoids the pow() underflow u^(1/w)
    * hits when w is small. u derives from the first 16 md5 hex bits of
    * the id ((h+1)/65536 — the +1 keeps ln() off −∞), so the draw is
    * deterministic, engine-portable ([[hashFraction]]'s idiom), and
    * independent of row order. Rows with weight ≤ 0 or null have
    * inclusion probability 0 and are dropped, per the paper.
    *
    * Selection compares UNROUNDED keys (both engines evaluate the same
    * IEEE expression tree on exact integer inputs) with the id as total-
    * order tiebreak; the emitted `es_key` is rounded to 4dp for output
    * parity only.
    *
    * Scale: the k-row cut is an `orderBy(...).limit(k)` — Catalyst plans
    * TakeOrderedAndProject (per-partition heaps + one k-row driver
    * merge), never a global sort; the weight scan is map-side. This IS
    * the distributed form of the paper's reservoir: each partition
    * keeps its local top-k by key, the merge keeps the global top-k. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") + lit(1.0)) / lit(65536.0)
    df.filter(weightCol > 0)
      .withColumn("__esk", log(u) / weightCol.cast("double"))
      .orderBy(col("__esk").desc, col(idCol))
      .limit(k)
      .withColumn("es_key", graft.functions.Num.round4(col("__esk")))
      .drop("__esk")
  }

  /** Per-GROUP weighted sampling — [[weightedSample]]'s Efraimidis–
    * Spirakis reservoir run independently inside every stratum: the
    * top-`kPerGroup` rows of each group by the exponential key
    * ln(u)/w. This is how a per-source curation budget takes QUALITY
    * into account ([[quotaPerStratum]] caps by count alone; this
    * spends each source's quota on its best-weighted documents, biased
    * exactly ∝ weight like the global q112 sampler).
    *
    * Scale: the global sampler's TakeOrderedAndProject becomes ONE
    * by-group window Exchange with WindowGroupLimit map-side pruning —
    * the q18/q107 shape; no single-partition anything. Weight ≤ 0 rows
    * are excluded per the paper, like [[weightedSample]]. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, groupCol: String,
                             weightCol: Column, kPerGroup: Int): DataFrame = {
    require(kPerGroup > 0, s"kPerGroup $kPerGroup must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") + lit(1.0)) / lit(65536.0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(col("__esk").desc, col(idCol))
    df.filter(weightCol > 0)
      .withColumn("__esk", log(u) / weightCol.cast("double"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= kPerGroup)
      .withColumn("es_key", graft.functions.Num.round4(col("__esk")))
      .drop("__esk")
  }

  /** Deterministic global shuffle + round-robin shard layout — how a
    * training run turns a corpus into dataloader shards: rows get a
    * pseudo-random but reproducible total order (md5 of seed+id, id as
    * tiebreak for md5-collision safety), then deal round-robin into
    * `nShards` shards balanced to within one row; within-shard order is
    * the shuffle order. A new `seed` is a fresh permutation (per-epoch
    * reshuffle) with zero state kept between runs.
    *
    * Scale: built on the two-phase rank ([[TopK.withPosition]]) — one
    * range shuffle plus a cluster-sized offsets join, never a
    * single-partition window. The output feeds
    * `repartition(shard) + sortWithinPartitions(pos)` as the physical
    * write layout, which adds the one hash shuffle any sharded write
    * pays. Adds `pos` (0-based global shuffle position, long) and
    * `shard` (int). */
  def shuffleShards(idCol: String, nShards: Int, seed: String = "")
                   (df: DataFrame): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    TopK.withPosition(Seq(key, col(idCol)), "pos")(df)
      .withColumn("pos", col("pos") - 1)
      .withColumn("shard", pmod(col("pos"), lit(nShards.toLong)).cast("int"))
  }

  /** Time-ordered train/test split with a leakage embargo: rows before
    * the cutoff train, rows inside the embargo gap after it are
    * DROPPED from both sides (labeled so the caller can count them),
    * rows after the gap test. The embargo is what makes a temporal
    * split honest when features or labels leak across nearby
    * timestamps (rolling aggregates, session context, near-duplicate
    * crawls of the same page hours apart): without the gap, test rows
    * adjacent to the train boundary share information with it and the
    * eval is optimistic. The financial-ML literature calls this purging
    * /embargo; a training-data pipeline needs it any time eval data is
    * "the future" of train data.
    *
    * The cutoff sits `trainNum/trainDen` of the way through the
    * observed time span and the gap is `span/embargoDen`, all in exact
    * epoch-µs integer arithmetic on non-negative operands — no float,
    * no calendar, engine-independent. Shape: one tiny min/max
    * aggregate broadcast back, then a pure projection over the fact
    * table — NO shuffle of the data itself; at any scale the split is
    * scan-speed. Emits (idCol, us, split ∈ train|embargo|test). */
  /** Max-min fair (water-filling) allocation of one GLOBAL budget
    * across groups — the mixture-design complement of
    * [[tokenBudgetSample]]'s fixed per-source budgets: given "train on
    * `budgetBp`/10⁴ of the corpus's total mass", how much of each
    * source does a fair allocator take? Every source gets its full
    * supply or the common water level `cap`, whichever is smaller —
    * the unique allocation maximizing the minimum share (Bertsekas &
    * Gallager 1992, §6.5.2's max-min fairness).
    *
    * Exact-integer closed form, no iteration: sort groups ascending by
    * supply; a group is fully satisfiable iff even granting its supply
    * to all remaining groups fits the remaining budget
    * (`avail·m + prefix ≤ B`, monotone in the sort order, so the
    * satisfied set is a prefix); the first unsatisfied row pins the
    * water level `cap = (B − prefix) DIV m`, and the division's
    * remainder goes to the `rem` largest-supply capped groups (+1
    * each — exactly the greedy `min(avail, R DIV m)` loop's result),
    * so `Σ alloc = min(B, Σ avail)` holds EXACTLY. All comparisons
    * ride DECIMAL(38,0): at 100 TB `avail·m` outgrows 64 bits long
    * before any emitted column does.
    *
    * Shape: one group-grain aggregate with map-side partials, then
    * windows over the GROUP-DOMAIN-sized table (the ksDrift staging
    * discipline — #groups rows, never corpus grain) and two broadcast
    * single-row joins. Emits one row per group:
    * (source, avail, alloc, capped, water_cap, budget, leftover) —
    * `water_cap`/`leftover` are the global water level (NULL when
    * nothing is capped) and unspent budget (0 unless supply ran out).
    */
  def waterfillBudget(df: DataFrame, groupCol: String, sizeCol: String,
                      budgetBp: Long): DataFrame = {
    require(budgetBp >= 0, s"budgetBp must be >= 0: $budgetBp")
    val w = org.apache.spark.sql.expressions.Window
    // staged: three plan branches (the rows, the totals, the pivot) read
    // this group-grain table — without the pin each would re-scan the
    // corpus for a #groups-row aggregate
    val avail = Staged.stage(df.groupBy(col(groupCol).as("source"))
      .agg(sum(col(sizeCol).cast("long")).as("avail")))
    val totals = avail.agg(count(lit(1)).as("__n"),
      sum(col("avail").cast("decimal(38,0)")).as("__tot"))
    val asc = w.orderBy(col("avail"), col("source"))
    val st = avail.crossJoin(broadcast(totals))
      .withColumn("__b", expr(s"cast(__tot * $budgetBp DIV 10000 as decimal(38,0))"))
      .withColumn("__rn", row_number().over(asc).cast("long"))
      .withColumn("__p",
        coalesce(sum(col("avail").cast("decimal(38,0)"))
          .over(asc.rowsBetween(w.unboundedPreceding, -1)),
          lit(0).cast("decimal(38,0)")))
      .withColumn("__m", col("__n") - col("__rn") + lit(1L))
      .withColumn("__sat",
        col("avail").cast("decimal(38,0)") * col("__m") + col("__p") <= col("__b"))
    // the first unsatisfied row pins the water level; min(struct) keyed
    // on __rn extracts it without an order-dependent limit. Empty set
    // (everything satisfiable) → NULL fields → the uncapped branch.
    val pivot = st.filter(!col("__sat"))
      .agg(min(struct(col("__rn"), col("__p"), col("__m"))).as("__pv"))
      .select(col("__pv.__p").as("__pp"), col("__pv.__m").as("__pm"))
    st.crossJoin(broadcast(pivot))
      .withColumn("__cap", expr("cast((__b - __pp) DIV __pm as bigint)"))
      .withColumn("__rem", expr("cast((__b - __pp) % __pm as bigint)"))
      .select(col("source"), col("avail"),
        when(col("__sat"), col("avail"))
          .otherwise(col("__cap") +
            when(col("__m") <= col("__rem"), 1L).otherwise(0L))
          .as("alloc"),
        (!col("__sat")).as("capped"),
        col("__cap").as("water_cap"),
        col("__b").cast("long").as("budget"),
        when(col("__pp").isNull, (col("__b") - col("__tot")).cast("long"))
          .otherwise(0L).as("leftover"))
  }

  /** Materialize [[waterfillBudget]]'s allocation as a document
    * keep-list: within each source, documents are taken in
    * deterministic md5-hash order (prefix "wf:", the [[hashBucket]]
    * portability discipline) until the next one would overshoot the
    * source's allocation — a greedy maximal prefix, so the kept mass
    * is ≤ alloc and within one document of it. Because both the
    * allocation (max-min fairness is monotone in the budget) and the
    * hash order (fixed) are stable, RAISING the budget only ever ADDS
    * documents — the nested-samples property every other sampler in
    * this file guarantees, now for the global-budget case.
    *
    * Shape: the q187 allocation (group-domain) broadcasts onto the
    * corpus; the only corpus-grain work is one per-SOURCE cumulative
    * window (never a global sort) and the scan-side hash. Emits the
    * kept (idCol, source, sizeCol) rows. */
  def waterfillSample(df: DataFrame, idCol: String, groupCol: String,
                      sizeCol: String, budgetBp: Long): DataFrame =
    waterfillSampleBy(df, idCol, groupCol, sizeCol, budgetBp,
      Seq(md5(concat(lit("wf:"), col(idCol).cast("string")))))

  /** [[waterfillSample]] with an explicit intra-source PRIORITY: the
    * cut keeps documents in `orderCols` order (ties broken by id)
    * until the source's allocation is exhausted — the production form
    * of a budget cut, which should shed the WORST documents, not
    * hash-random ones (pass a quality score descending). The
    * nested-samples property survives any fixed ordering: the order
    * doesn't depend on the budget, so raising the budget still only
    * extends each source's kept prefix. */
  def waterfillSampleBy(df: DataFrame, idCol: String, groupCol: String,
                        sizeCol: String, budgetBp: Long,
                        orderCols: Seq[Column]): DataFrame = {
    val alloc = waterfillBudget(df, groupCol, sizeCol, budgetBp)
      .select(col("source"), col("alloc"))
    // materialize the priority expressions scan-side so the pruned
    // projection can still order by them (they may read columns —
    // text, scores — the output doesn't carry)
    val ord = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__ord$i") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(orderCols.indices.map(i => col(s"__ord$i")) :+ col(idCol): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(Seq(col(idCol), col(groupCol).as("source"),
        col(sizeCol).cast("long").as(sizeCol)) ++ ord: _*)
      .join(broadcast(alloc), Seq("source"))
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .filter(col("__cum") <= col("alloc"))
      .select(col(idCol), col("source"), col(sizeCol))
  }

  def temporalEmbargoSplit(df: DataFrame, idCol: String, tsCol: String,
                           trainNum: Int = 8, trainDen: Int = 10,
                           embargoDen: Int = 50): DataFrame = {
    require(trainNum > 0 && trainDen > trainNum,
      s"train fraction $trainNum/$trainDen must be in (0,1)")
    require(embargoDen > 0, s"embargoDen $embargoDen must be positive")
    val bounds = df.agg(min(unix_micros(col(tsCol))).as("__lo"),
      max(unix_micros(col(tsCol))).as("__hi"))
    df.select(col(idCol), unix_micros(col(tsCol)).as("us"))
      .crossJoin(broadcast(bounds))
      .withColumn("__cut",
        expr(s"__lo + (__hi - __lo) * $trainNum DIV $trainDen"))
      .withColumn("__gap", expr(s"(__hi - __lo) DIV $embargoDen"))
      .select(col(idCol), col("us"),
        when(col("us") < col("__cut"), "train")
          .when(col("us") < col("__cut") + col("__gap"), "embargo")
          .otherwise("test").as("split"))
  }
}
