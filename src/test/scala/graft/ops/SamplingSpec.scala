package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    .toDF("id", "stratum")

  test("hexThreshold maps rates to 1/256-granular hex prefixes") {
    assert(Sampling.hexThreshold(0.0) === "00")
    assert(Sampling.hexThreshold(0.5) === "80")
    assert(Sampling.hexThreshold(0.25) === "40")
    assert(Sampling.hexThreshold(0.125) === "20")
    // keep-all sentinel: must sort above every 2-hex-digit bucket
    assert(Sampling.hexThreshold(1.0) === "g")
    assert("ff" < Sampling.hexThreshold(1.0))
  }

  test("rate 1.0 keeps every row of its stratum") {
    val out = Sampling.stratifiedByHash(ids, "id", "stratum",
      Map("a" -> 1.0), defaultRate = 0.0)
    assert(out.count() === 1000L)
    assert(out.filter(col("stratum") =!= "a").count() === 0L)
  }

  test("stratified sample hits each stratum's rate within sampling error") {
    val out = Sampling.stratifiedByHash(ids, "id", "stratum",
        Map("a" -> 0.5), defaultRate = 0.125)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // 1000 ids per stratum; binomial 3σ ≈ 47 at p=.5, ≈ 31 at p=.125
    assert(math.abs(out("a") - 500L) < 60, out.toString)
    assert(math.abs(out.getOrElse("b", 0L) - 125L) < 40, out.toString)
  }

  test("sampling is deterministic and independent of partitioning") {
    val once = Sampling.stratifiedByHash(ids, "id", "stratum", Map(), 0.25)
      .select("id").as[Long].collect().toSet
    val again = Sampling.stratifiedByHash(ids.repartition(13), "id", "stratum",
        Map(), 0.25)
      .select("id").as[Long].collect().toSet
    assert(once === again && once.nonEmpty)
  }

  test("samples are nested: raising the rate only adds rows (mixture re-weighting consistency)") {
    val rates = Seq(0.125, 0.25, 0.5, 0.75)
    val sets = rates.map { r =>
      Sampling.stratifiedByHash(ids, "id", "stratum", Map(), r)
        .select("id").as[Long].collect().toSet
    }
    sets.sliding(2).foreach { case Seq(lo, hi) => assert(lo.subsetOf(hi)) }
    assert(sets.head.nonEmpty && sets.last.size > sets.head.size)
  }

  test("splitByHash partitions every row into exactly one split at ~the requested rates") {
    val out = Sampling.splitByHash(ids, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.values.sum === 2000L) // exactly one split per row
    assert(math.abs(out("train") - 1600L) < 80, out.toString)
    assert(math.abs(out("val") - 200L) < 60, out.toString)
    assert(math.abs(out("test") - 200L) < 60, out.toString)
    // stability under corpus growth: assignments of the first 500 ids are
    // unchanged when computed over a larger corpus
    val small = Sampling.splitByHash(ids.filter(col("id") < 500), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    val large = Sampling.splitByHash(ids, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("id") < 500)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(small === large)
  }

  test("shuffleShards: a permutation, balanced round-robin shards, seed reshuffles") {
    Staged.withStaged {
      val out = Sampling.shuffleShards("id", 3, "epoch0")(ids.select("id"))
        .select("id", "pos", "shard").as[(Long, Long, Int)].collect()
      // pos is exactly 0..n-1 (a permutation), shard = pos mod 3
      assert(out.map(_._2).sorted.toSeq === (0L until 2000L))
      assert(out.forall { case (_, p, s) => s === (p % 3).toInt })
      // round-robin deals shards balanced to within one row
      val sizes = out.groupBy(_._3).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, sizes.toString)
      // reproducible: a second run is byte-identical
      val again = Sampling.shuffleShards("id", 3, "epoch0")(ids.select("id"))
        .select("id", "pos", "shard").as[(Long, Long, Int)].collect()
      assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
      // a new seed is a genuinely different permutation
      val epoch1 = Sampling.shuffleShards("id", 3, "epoch1")(ids.select("id"))
        .select("id", "pos").as[(Long, Long)].collect().toMap
      val same = out.count { case (id, p, _) => epoch1(id) == p }
      assert(same < out.length / 10, s"$same of ${out.length} positions unchanged")
    }
  }

  test("tokenBudgetSample: budgets hit in expectation, keep-all elsewhere, nested") {
    val docs = ids.withColumn("source",
        when(col("id") < 1000, "capped").otherwise("free"))
      .withColumn("w", lit(10L))
    // capped: 1000 rows x 10 = 10000 total, budget 2500 -> rate 0.25
    val out = Sampling.tokenBudgetSample(docs, "id", "source", "w",
      Map("capped" -> 2500L))
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("free") === 1000L) // unlisted source keeps everything
    assert(math.abs(kept("capped") - 250L) < 60, kept.toString)
    // nested: a tighter budget selects a subset of the looser budget
    val tight = Sampling.tokenBudgetSample(docs, "id", "source", "w",
      Map("capped" -> 1000L)).select("id").as[Long].collect().toSet
    val loose = out.select("id").as[Long].collect().toSet
    assert(tight.subsetOf(loose))
  }

  test("tokenBudgetSample: null sources kept in full, null weights count as zero") {
    val docs = Seq(
      (1L, Option("a"), Option(10L)), (2L, Option("a"), Option.empty[Long]),
      (3L, Option.empty[String], Option(10L)), (4L, Option.empty[String], Option.empty[Long]))
      .toDF("id", "source", "w")
    // null-source rows have no budget -> rate 1.0, never dropped by the join
    val out = Sampling.tokenBudgetSample(docs, "id", "source", "w", Map("a" -> 10L))
    assert(out.filter(col("source").isNull).count() === 2)
    assert(out.count() === 4) // budget 10 covers a's non-null total of 10
    // a budgeted source whose weights are ALL null: total 0 -> nothing to
    // budget, keep in full (and no divide-by-zero path)
    val allNull = Seq((1L, "z", Option.empty[Long]), (2L, "z", Option.empty[Long]))
      .toDF("id", "source", "w")
    assert(Sampling.tokenBudgetSample(allNull, "id", "source", "w", Map("z" -> 5L))
      .count() === 2)
  }

  test("repeatByFactor: fractional epochs in expectation, rep is a copy index") {
    val docs = ids.withColumn("source",
      when(col("id") < 1000, "up").otherwise("down"))
    val out = Sampling.repeatByFactor(docs, "id", "source",
        Map("up" -> 2.5, "down" -> 0.5))
      .select("id", "source", "rep").as[(Long, String, Long)].collect()
    val up = out.filter(_._2 == "up")
    val down = out.filter(_._2 == "down")
    // up: 1000 ids -> ~2500 rows, every id at least twice, rep in 0..n-1
    assert(math.abs(up.length - 2500) < 150, up.length.toString)
    val byId = up.groupBy(_._1).values
    assert(byId.forall(rs => rs.map(_._3).sorted.toSeq == (0L until rs.size)))
    assert(byId.forall(rs => rs.size == 2 || rs.size == 3))
    // down: ~500 of 1000 ids survive, exactly once
    assert(math.abs(down.length - 500) < 120, down.length.toString)
    assert(down.groupBy(_._1).values.forall(_.size == 1))
    // deterministic: a second run is identical
    val again = Sampling.repeatByFactor(docs, "id", "source",
        Map("up" -> 2.5, "down" -> 0.5))
      .select("id", "source", "rep").as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq === again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("quotaPerStratum: exact cap on big strata, small strata untouched, deterministic") {
    val docs = ids.withColumn("source",
      when(col("id") < 1950, "big").otherwise("small"))
    val out = Sampling.quotaPerStratum(docs, "id", "source", 100)
      .select("id", "source").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("big").size === 100)         // 1950 rows -> capped at 100
    assert(bySrc("small").size === 50)        // 50 rows -> under quota, all kept
    // deterministic and partitioning-independent
    val again = Sampling.quotaPerStratum(docs.repartition(13), "id", "source", 100)
      .select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet === again)
    // raising the quota only ADDS rows (hash order is a total order, so
    // the top-100 set is a prefix of the top-150 set)
    val wider = Sampling.quotaPerStratum(docs, "id", "source", 150)
      .select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet.subsetOf(wider))
  }

  test("cluster-keyed split never straddles a cluster; the doc-keyed split provably leaks") {
    // near-dup clusters as (doc -> cluster label); under a DOC-keyed
    // md5 split some cluster must land in two splits (the leakage mode
    // q108 exists to kill); keying the same split on the CLUSTER label
    // makes straddling impossible by construction
    val members = (0L until 200L).map(i => (i, i / 4 * 4)) // clusters of 4
    val df = members.toDF("doc_id", "cluster")
    val docKeyed = Sampling.splitByHash(df, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("cluster", "split").as[(Long, String)].collect()
    assert(docKeyed.groupBy(_._1).values.exists(_.map(_._2).distinct.size > 1),
      "expected at least one doc-keyed cluster to straddle splits")
    val clusterKeyed = Sampling.splitByHash(df, "cluster",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("cluster", "split").as[(Long, String)].collect()
    assert(clusterKeyed.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    // every split still non-empty at these rates on 50 clusters
    assert(clusterKeyed.map(_._2).distinct.sorted.toSeq === Seq("test", "train", "val"))
  }

  test("dsirWeights: target-vocabulary docs outscore off-target docs, deterministic, integer-exact") {
    Staged.withStaged {
      // two disjoint vocabularies; target = the 'good' half. A held-back
      // good doc (not flagged target) must still score like the target
      // docs — the whole point of importance weighting vs a label filter.
      val good = (0L until 20L).map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta iota kappa w$i", i < 19))
      val bad = (20L until 40L).map(i => (i, s"one two three four five six seven eight nine ten w$i", false))
      val docs = (good ++ bad).toDF("id", "text", "is_tgt")
      val out = Sampling.dsirWeights(docs, "id", "text", col("is_tgt"), 64)
        .select("id", "weight_q").as[(Long, Long)].collect().toMap
      val heldBackGood = out(19L)
      assert(bad.forall { case (i, _, _) => out(i) < heldBackGood },
        s"held-back good doc $heldBackGood not above bad docs")
      assert(good.filter(_._3).forall { case (i, _, _) => out(i) > out(20L) })
      // partitioning-independent (integer quantization makes sums exact)
      val again = Sampling.dsirWeights(docs.repartition(13), "id", "text", col("is_tgt"), 64)
        .select("id", "weight_q").as[(Long, Long)].collect().toMap
      assert(out === again)
    }
  }

  test("temperatureQuota: flattens skew toward the budget mix, nested in budget, deterministic") {
    // 1600 'big' vs 400 'small': natural shares 80/20; alpha=0.5 shares
    // ∝ sqrt -> 40/20 = 2:1, so a 300 budget splits 200/100
    val docs = ids.withColumn("lang",
      when(col("id") < 1600, "big").otherwise("small"))
    val out = Sampling.temperatureQuota(docs, "id", "lang", 0.5, 300)
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang("big").size === 200)
    assert(byLang("small").size === 100)
    // nested: a bigger budget's kept set contains the smaller's
    val wider = Sampling.temperatureQuota(docs, "id", "lang", 0.5, 600)
      .select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet.subsetOf(wider))
    // deterministic and partitioning-independent
    val again = Sampling.temperatureQuota(docs.repartition(13), "id", "lang", 0.5, 300)
      .select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet === again)
    // a stratum never exceeds its size, and tails keep at least one row
    val tiny = docs.filter(col("id") < 1601) // 'small' has a single row
    val keptTiny = Sampling.temperatureQuota(tiny, "id", "lang", 0.5, 100)
      .filter(col("lang") === "small").count()
    assert(keptTiny === 1L)
  }

  test("packSequences: contiguous zero-waste packing per shard, deterministic") {
    Staged.withStaged {
      val docs = ids.select("id").withColumn("n", (col("id") % 7) + 1)
      val out = Sampling.packSequences("id", "n", 16, 3, "epoch0")(docs)
        .select("id", "shard", "pos", "n", "offset", "bin")
        .as[(Long, Int, Long, Long, Long, Long)].collect()
      assert(out.length === 2000)
      // within each shard the docs tile the token stream exactly:
      // offsets in pos order are the running sum of the previous lengths
      out.groupBy(_._2).values.foreach { shard =>
        val inOrder = shard.sortBy(_._3)
        val expected = inOrder.map(_._4).scanLeft(0L)(_ + _).init
        assert(inOrder.map(_._5).toSeq === expected.toSeq)
      }
      // bin is the 16-token sequence the doc STARTS in
      assert(out.forall { case (_, _, _, _, off, bin) => bin === off / 16 })
      // deterministic and partitioning-independent
      val again = Sampling.packSequences("id", "n", 16, 3, "epoch0")(
          docs.repartition(13))
        .select("id", "shard", "pos", "n", "offset", "bin")
        .as[(Long, Int, Long, Long, Long, Long)].collect()
      assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    }
  }

  test("packSequences: the running sum is windowed by shard, never one global partition") {
    Staged.withStaged {
      val docs = ids.select("id").withColumn("n", lit(5L))
      val windows = Sampling.packSequences("id", "n", 16, 3)(docs)
        .queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
        }
      assert(windows.isEmpty, windows.mkString("\n"))
    }
  }

  test("the sample filter pushes down to the scan (no shuffle, no exchange)") {
    val plan = Sampling.stratifiedByHash(ids, "id", "stratum", Map("a" -> 0.5), 0.125)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weightedSample: k rows, zero/null weights excluded, deterministic across partitionings") {
    val docs = ids.select(col("id"),
      when(col("id") % 100 === 0, lit(null).cast("long"))
        .when(col("id") % 100 === 1, lit(0L))
        .otherwise(col("id") % 7 + 1).as("w"))
    val out = Sampling.weightedSample(docs, "id", col("w"), 300)
      .select("id").as[Long].collect().toSet
    assert(out.size === 300)
    assert(out.forall(i => i % 100 != 0 && i % 100 != 1))
    val again = Sampling.weightedSample(docs.repartition(13), "id", col("w"), 300)
      .select("id").as[Long].collect().toSet
    assert(out === again)
  }

  test("weightedSample: matches the Efraimidis–Spirakis order computed by hand") {
    val docs = Seq((1L, 5L), (2L, 1L), (3L, 50L), (4L, 10L)).toDF("id", "w")
    // replicate: u = (first-16-md5-bits + 1)/65536, key = ln(u)/w, top-2
    val expected = docs.collect().map { r =>
      val id = r.getLong(0); val w = r.getLong(1)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      (id, math.log((java.lang.Long.parseLong(hex, 16) + 1.0) / 65536.0) / w)
    }.sortBy { case (id, k) => (-k, id) }.take(2).map(_._1).toSet
    val got = Sampling.weightedSample(docs, "id", col("w"), 2)
      .select("id").as[Long].collect().toSet
    assert(got === expected)
  }

  test("weightedSample: higher weight wins at equal hash draw (key monotone in weight)") {
    // two ids with the SAME u would need an md5 collision; instead pin
    // monotonicity directly: raising one row's weight can only move it
    // INTO the sample, never out (the paper's key is monotone in w)
    val base = ids.select(col("id"), (col("id") % 7 + 1).as("w"))
    val kept = Sampling.weightedSample(base, "id", col("w"), 200)
      .select("id").as[Long].collect().toSet
    val boosted = base.withColumn("w",
      when(col("id") === 42L, lit(10000L)).otherwise(col("w")))
    val kept2 = Sampling.weightedSample(boosted, "id", col("w"), 200)
      .select("id").as[Long].collect().toSet
    assert(kept2.contains(42L))
    // only id 42's membership may differ
    assert((kept2 - 42L).subsetOf(kept + 42L) && (kept -- kept2 - 42L).size <= 1)
  }

  test("weightedSample plans TakeOrderedAndProject, never a global Sort") {
    val docs = ids.select(col("id"), (col("id") % 7 + 1).as("w"))
    val plan = Sampling.weightedSample(docs, "id", col("w"), 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("weightedSamplePerGroup: per-slice runs of the global sampler, k per group, partition-invariant") {
    val docs = (1L to 300L)
      .map(i => (i, s"g${i % 3}", (i % 17) + 1))
      .toDF("id", "grp", "w")
    val out = Sampling.weightedSamplePerGroup(docs, "id", "grp", col("w"), 20)
      .as[(Long, String, Long, Long, Double)].collect()
    assert(out.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map("g0" -> 20, "g1" -> 20, "g2" -> 20))
    // per group ≡ the GLOBAL sampler run on that group's slice alone
    Seq("g0", "g1", "g2").foreach { g =>
      val slice = Sampling.weightedSample(
          docs.filter(col("grp") === g).select("id", "w"), "id", col("w"), 20)
        .select("id").as[Long].collect().toSet
      val mine = out.filter(_._2 == g).map(_._1).toSet
      assert(mine === slice, s"group $g diverges from the global sampler")
    }
    val again = Sampling.weightedSamplePerGroup(
        docs.repartition(11), "id", "grp", col("w"), 20)
      .as[(Long, String, Long, Long, Double)].collect()
    assert(out.sortBy(r => (r._2, r._4)).toSeq === again.sortBy(r => (r._2, r._4)).toSeq)
  }

  test("weightedSamplePerGroup: by-group window (never single-partition), WindowGroupLimit prunes map-side") {
    val docs = (1L to 300L).map(i => (i, s"g${i % 3}", i % 7 + 1)).toDF("id", "grp", "w")
    val q = Sampling.weightedSamplePerGroup(docs, "id", "grp", col("w"), 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    val emptySpecs = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(emptySpecs.isEmpty)
  }

  test("temporalEmbargoSplit: exact integer boundaries, every row labeled, embargo between the sides") {
    val df = (0L until 100L).map(i => (i, i)).toDF("id", "us_raw")
      .select(col("id"), timestamp_micros(col("us_raw")).as("ts"))
    val out = Sampling.temporalEmbargoSplit(df, "id", "ts")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._2)
    assert(out.size === 100)
    // span 99: cutoff = 0 + 99*8 DIV 10 = 79, gap = 99 DIV 50 = 1
    assert(out.filter(_._3 == "train").map(_._2) === (0L to 78L))
    assert(out.filter(_._3 == "embargo").map(_._2) === Seq(79L))
    assert(out.filter(_._3 == "test").map(_._2) === (80L to 99L))
    // no train row at or after any embargo/test row; no test row
    // inside the gap — the temporal order IS the split order
    val maxTrain = out.filter(_._3 == "train").map(_._2).max
    val minTest = out.filter(_._3 == "test").map(_._2).min
    assert(maxTrain < 79L + 1L && minTest >= 80L)
  }

  test("temporalEmbargoSplit: the fact table does not shuffle (tiny bounds aggregate broadcast back)") {
    val df = (0L until 100L).map(i => (i, i)).toDF("id", "us_raw")
      .select(col("id"), timestamp_micros(col("us_raw")).as("ts"))
    val plan = Sampling.temporalEmbargoSplit(df, "id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // the only Exchange feeds the single-row bounds aggregate, never
    // the fact side: no hash/range repartition of the data
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"), plan)
  }

  test("pack-efficiency bookkeeping: waste is exactly the final partial bin, straddlers counted exactly") {
    import org.apache.spark.sql.functions._
    // single shard, seqLen 10: docs of 6, 4 (ends bin 0 exactly — no
    // straddle), 7 (0..6 of bin 1), 5 (crosses into bin 2: straddler)
    val docs = Seq((1L, 6L), (2L, 4L), (3L, 7L), (4L, 5L))
      .toDF("doc_id", "n_tokens")
    val packed = Sampling.packSequences("doc_id", "n_tokens", 10, 1, "z")(docs)
      .select("doc_id", "n_tokens", "offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val total = 22L
    val straddlers = packed.values.count { case (_, n, off) =>
      n > 0 && off / 10 != (off + n - 1) / 10 }
    // offsets are a permutation of the docs (md5 order), but the
    // CONSERVED quantities don't depend on it:
    assert(packed.values.map(_._2).sum === total)
    val nBins = (total + 9) / 10
    assert(nBins === 3L && nBins * 10 - total === 8L,
      "waste = final partial bin only")
    // straddler count is order-dependent; verify the definition by
    // recomputing from the actual offsets and comparing to a walk
    val walk = packed.values.toSeq.sortBy(_._3)
    var cursor = 0L; var expectStraddle = 0
    walk.foreach { case (_, n, off) =>
      assert(off === cursor, "offsets are gapless — concat-and-chop")
      if (n > 0 && off / 10 != (off + n - 1) / 10) expectStraddle += 1
      cursor += n
    }
    assert(straddlers === expectStraddle)
  }

  // ---- waterfillBudget: max-min fair global-budget allocation ----

  /** Independent greedy reference: ascending by (avail, name), each
    * group takes min(avail, remaining DIV groupsLeft) — the textbook
    * progressive-filling loop the closed form must reproduce. */
  private def refWaterfill(avails: Seq[(String, Long)], bp: Long): Map[String, Long] = {
    val budget = (avails.map(a => BigInt(a._2)).sum * bp / 10000).toLong
    var r = budget
    var m = avails.size
    avails.sortBy { case (s, a) => (a, s) }.map { case (s, a) =>
      val give = math.min(a, r / m)
      r -= give; m -= 1
      s -> give
    }.toMap
  }

  private def runWaterfill(avails: Seq[(String, Long)], bp: Long): Map[String, Long] = {
    // expand each group's supply into unit-ish rows so the operator's
    // group-by actually aggregates (3 rows per group, sizes summing to avail)
    val rows = avails.flatMap { case (s, a) =>
      val p = a / 3
      Seq((s, p), (s, p), (s, a - 2 * p))
    }.toDF("source", "n")
    Staged.withStaged {
      Sampling.waterfillBudget(rows, "source", "n", bp)
        .select("source", "alloc").as[(String, Long)].collect()
    }.toMap
  }

  test("waterfill equals the progressive-filling reference on generated supplies") {
    val seeds = Seq(1, 7, 13, 29, 41, 97)
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(12)
      val avails = (0 until n).map(i => (f"s$i%02d", rnd.nextInt(10000).toLong * 3))
      Seq(0L, 1000L, 5000L, 9500L, 10000L).foreach { bp =>
        val got = runWaterfill(avails, bp)
        val want = refWaterfill(avails, bp)
        assert(got === want, s"seed=$seed bp=$bp avails=$avails")
      }
    }
  }

  test("waterfill conserves the budget exactly and never over-allocates a source") {
    val avails = Seq(("a", 300L), ("b", 3000L), ("c", 30000L), ("d", 9L))
    val out = Staged.withStaged {
      Sampling.waterfillBudget(
          avails.toDF("source", "n"), "source", "n", 4000L)
        .select("source", "avail", "alloc", "capped", "water_cap", "leftover")
        .as[(String, Long, Long, Boolean, Option[Long], Long)].collect()
    }
    val tot = avails.map(_._2).sum
    val budget = tot * 4000L / 10000L
    assert(out.map(_._3).sum === math.min(budget, tot), "Σalloc = min(B, supply)")
    out.foreach { case (s, avail, alloc, capped, cap, leftover) =>
      assert(alloc <= avail, s"$s over-allocated")
      assert(capped === (alloc < avail), s"$s capped flag")
      assert(leftover === 0L)
      // the water level separates full from capped: full supplies sit
      // at or below cap, capped allocations are cap or cap+1
      cap.foreach { c =>
        if (!capped) assert(avail <= c, s"$s full above water level")
        else assert(alloc === c || alloc === c + 1, s"$s alloc off level")
      }
    }
  }

  test("waterfill remainder goes to the largest capped sources, +1 each") {
    // three equal supplies of 10, budget 8 → cap 2 rem 2: ascending
    // (avail, name) order a,b,c has m = 3,2,1; m <= rem picks b and c
    val out = Staged.withStaged {
      Sampling.waterfillBudget(
          Seq(("a", 10L), ("b", 10L), ("c", 10L)).toDF("source", "n"),
          "source", "n", 2667L)
        .select("source", "alloc").as[(String, Long)].collect()
    }.toMap
    assert(out === Map("a" -> 2L, "b" -> 3L, "c" -> 3L))
  }

  test("waterfillSample: per-source kept mass is a maximal prefix under its allocation") {
    val rnd = new scala.util.Random(19)
    val docs = (0L until 120L).map { i =>
      (i, s"g${i % 4}", 1L + rnd.nextInt(40).toLong)
    }
    val df = docs.toDF("doc_id", "source", "n_chars")
    val allocs = Staged.withStaged {
      Sampling.waterfillBudget(df, "source", "n_chars", 6000L)
        .select("source", "alloc").as[(String, Long)].collect().toMap
    }
    val kept = Staged.withStaged {
      Sampling.waterfillSample(df, "doc_id", "source", "n_chars", 6000L)
        .as[(Long, String, Long)].collect().toSeq
    }
    def h(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wf:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      d
    }
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val keptSrc = kept.filter(_._2 == src).map(_._1).toSet
      val mass = ds.filter(d => keptSrc(d._1)).map(_._3).sum
      assert(mass <= allocs(src), s"$src over allocation")
      // maximality: kept is exactly the hash-order prefix whose next
      // element would overshoot
      val order = ds.sortBy(d => (h(d._1), d._1))
      var cum = 0L
      val expect = order.takeWhile { d => cum += d._3; cum <= allocs(src) }
      assert(keptSrc === expect.map(_._1).toSet, src)
    }
  }

  test("waterfillSample is nested in the budget: raising it only adds documents") {
    val rnd = new scala.util.Random(23)
    val docs = (0L until 90L).map(i => (i, s"g${i % 3}", 1L + rnd.nextInt(25).toLong))
      .toDF("doc_id", "source", "n_chars")
    val sets = Seq(2000L, 5000L, 8000L, 10000L).map { bp =>
      Staged.withStaged {
        Sampling.waterfillSample(docs, "doc_id", "source", "n_chars", bp)
          .select("doc_id").as[Long].collect().toSet
      }
    }
    sets.sliding(2).foreach { case Seq(lo, hi) => assert(lo.subsetOf(hi)) }
    assert(sets.last.size === 90, "full budget keeps every document")
    assert(sets.head.nonEmpty && sets.head.size < sets.last.size)
  }

  test("waterfillSampleBy sheds the worst documents first and stays nested in the budget") {
    // one source, five docs of 10 chars each: three unique-rich, two
    // templated (all-repeated tokens -> uniq_bp low -> ord key high)
    val docs = Seq(
      (1L, "s", "alpha beta gamma", 10L),
      (2L, "s", "spam spam spam spam", 10L),
      (3L, "s", "delta epsilon zeta", 10L),
      (4L, "s", "dup dup dup dup dup", 10L),
      (5L, "s", "eta theta iota", 10L))
      .toDF("doc_id", "source", "text", "n_chars")
    val pri = Seq(org.apache.spark.sql.functions.expr(
      """10000 - coalesce(
        cast((size(array_distinct(filter(split(trim(text), '\\s+'),
          x -> x != ''))) * 10000L) DIV
          size(filter(split(trim(text), '\\s+'), x -> x != ''))
          as bigint), 0)"""))
    // budget 60% of 50 = 30 chars = exactly the three unique-rich docs
    val kept = Staged.withStaged {
      Sampling.waterfillSampleBy(docs, "doc_id", "source", "n_chars", 6000L, pri)
        .select("doc_id").as[Long].collect().toSet
    }
    assert(kept === Set(1L, 3L, 5L), s"templated docs must be cut first: $kept")
    // nested: the 80% budget (40 chars) adds a templated doc, drops none
    val wider = Staged.withStaged {
      Sampling.waterfillSampleBy(docs, "doc_id", "source", "n_chars", 8000L, pri)
        .select("doc_id").as[Long].collect().toSet
    }
    assert(kept.subsetOf(wider) && wider.size === 4)
  }

  test("waterfill at full budget keeps everything; surplus shows as leftover") {
    val df = Seq(("a", 7L), ("b", 11L)).toDF("source", "n")
    val full = Staged.withStaged {
      Sampling.waterfillBudget(df, "source", "n", 10000L)
        .select("source", "avail", "alloc", "capped", "water_cap", "leftover")
        .as[(String, Long, Long, Boolean, Option[Long], Long)].collect()
    }
    full.foreach { case (_, avail, alloc, capped, cap, leftover) =>
      assert(alloc === avail && !capped && cap.isEmpty && leftover === 0L)
    }
    val surplus = Staged.withStaged {
      Sampling.waterfillBudget(df, "source", "n", 20000L)
        .select("leftover").as[Long].collect()
    }
    assert(surplus.forall(_ === 18L), "200% budget over 18 supply leaves 18")
  }
}
