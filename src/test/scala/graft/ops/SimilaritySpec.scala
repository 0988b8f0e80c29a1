package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(-1.0f, 0.0f)),
    (4L, Seq(0.8f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK: correct neighbor order for a known query") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", 3)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.map(_._2) === Seq(1L, 4L, 2L)) // by descending cosine to (1,0)
    assert(out.head._3 > 0.99)
    assert(out.map(_._4) === Seq(1L, 2L, 3L))
  }

  test("bruteForceTopK excludes self-matches") {
    val out = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 4)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() === 0)
    assert(out.groupBy("query_id").count().select(max("count")).as[Long].head() === 4)
  }

  test("ivfTopK: full probe of all centroids reproduces brute-force exactly") {
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 2)
    val ivf = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", 2,
      nCentroids = 2, nProbe = 2) // probing every cell → exact
    assert(brute.exceptAll(ivf).count() === 0 && ivf.exceptAll(brute).count() === 0)
  }

  test("ivfTopK: partial probe returns ranked results from probed cells only") {
    // query every vector: with 2 cells over 5 vectors some cell holds >= 2
    // members, so at least one query sees a non-self candidate
    val out = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", 3,
        nCentroids = 2, nProbe = 1)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { rows =>
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims === sims.sorted.reverse) // descending sim per query
    }
    // every reported sim agrees with the exact brute-force similarity
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 4)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    out.foreach { case (q, n, s, _) => assert(brute((q, n)) === s) }
  }

  test("ivfTopK with a Lloyd round: full probe still reproduces brute-force exactly") {
    // refinement moves centroids but full probing scores every cell, so
    // the result must stay exact regardless of where the centroids sit
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 2)
    val ivf = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", 2,
      nCentroids = 2, nProbe = 2, nIters = 1)
    assert(brute.exceptAll(ivf).count() === 0 && ivf.exceptAll(brute).count() === 0)
  }

  test("ivfTopKDeterministic: full probe reproduces brute-force exactly") {
    // the q96 verification twin honors the same exactness-at-full-probe
    // law as the production ivfTopK; a partial probe scans fewer cells,
    // so per query its best sim can never exceed the full probe's
    val cents = Similarity.md5SeededCentroids(emb, "vec_id", "embedding", 2)
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 2)
    val full = Similarity.ivfTopKDeterministic(emb, emb, "vec_id", "embedding", 2,
      cents, nProbe = 2)
    assert(brute.exceptAll(full).count() === 0 && full.exceptAll(brute).count() === 0)
    val best = (df: org.apache.spark.sql.DataFrame) => df.filter(col("rk") === 1)
      .select(col("query_id"), col("sim")).as[(Long, Double)].collect().toMap
    val partialBest = best(Similarity.ivfTopKDeterministic(
      emb, emb, "vec_id", "embedding", 2, cents, nProbe = 1))
    val fullBest = best(full)
    assert(partialBest.forall { case (q, s) => s <= fullBest(q) })
  }

  test("ivfTopKDeterministicFiltered ≡ unfiltered search over the pre-filtered corpus; neighbors share the query's label") {
    // cell assignment is per-row against broadcast centroids, so
    // filter-then-search and search-with-filter must commute — the
    // equivalence that makes the filter's semantics exact, not a rerank
    val labeled = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.0f, 1.0f), 1), (3L, Seq(-1.0f, 0.0f), 1),
      (4L, Seq(0.8f, 0.2f), 0), (5L, Seq(0.1f, 0.9f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.md5SeededCentroids(labeled, "vec_id", "embedding", 2)
    val filtered = Similarity.ivfTopKDeterministicFiltered(labeled, labeled,
      "vec_id", "embedding", "label", 2, cents, nProbe = 2)
    // every returned neighbor carries the query's own label
    val byQuery = labeled.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val neigh = filtered.select("query_id", "label", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(neigh.nonEmpty)
    assert(neigh.forall { case (q, l, n) => byQuery(q) === l && byQuery(n) === l })
    // ≡ running the unfiltered search per label slice
    val bySlice = Seq(0, 1).map { l =>
      val slice = labeled.filter(col("label") === l)
      Similarity.ivfTopKDeterministic(slice, slice, "vec_id", "embedding", 2,
        cents, nProbe = 2).withColumn("label", lit(l))
        .select("query_id", "label", "neighbor_id", "sim", "rk")
    }.reduce(_ union _)
    assert(filtered.exceptAll(bySlice).count() === 0 &&
      bySlice.exceptAll(filtered).count() === 0)
  }

  test("Lloyd refinement does not worsen cell balance on a clustered fixture") {
    // two tight clusters; hash-sampled seeds can land lopsided — after a
    // refinement round centroids move toward cell means, so the cell-size
    // spread must not grow (and drops whenever the seeds were unbalanced)
    val clustered = (0L until 20L).map(i => (i, Seq(1.0f, 0.001f * i))) ++
      (100L until 120L).map(i => (i, Seq(0.001f * (i - 100), 1.0f)))
    val df = clustered.toDF("vec_id", "embedding")
    def spread(nIters: Int): Long = {
      val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", 2, nIters)
      val sizes = Similarity.assignCells(df, "vec_id", "embedding", cents)
        .groupBy("centroid_id").count().select("count").as[Long].collect()
      assert(sizes.length === 2, sizes.toSeq.toString)
      sizes.max - sizes.min
    }
    assert(spread(1) <= spread(0), s"refined=${spread(1)} seeded=${spread(0)}")
  }

  test("ANN recall: declared LSH and IVF queries recover >= 0.6 of exact top-5 (sf0.01)") {
    // q50 joins each approximate method's output against the brute-force
    // ground truth; this pins the quantitative floor the rows-only
    // CORRECTNESS entries for q30/q35 can't express
    val rec = graft.SparkEntry.queries("q50_ann_recall")(spark, "/root/testdata/sf0.01")
      .select("method", "recall").as[(String, Double)].collect().toMap
    assert(rec.keySet === Set("lsh", "ivf", "ivf_lloyd", "pq", "ivfpq", "jl16"), rec.toString)
    assert((rec - "jl16").values.forall(_ >= 0.6), rec.toString)
    // PQ + exact rerank should beat the bucket methods on this corpus
    assert(rec("pq") >= 0.8, rec.toString)
    // the documented jl16 finding: data-blind sign projection at k=16
    // collapses fine ranking here (1/√k noise ≫ neighbor margins) while
    // PQ at the same byte budget stays ≥ 0.8 — pin the ORDER of the gap
    // so the comparison stays on record
    assert(rec("jl16") < 0.3 && rec("pq") - rec("jl16") > 0.5, rec.toString)
  }

  test("pqEncode: m codes per vector, every code within the codebook, no shuffle") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 16, trainN = 256, nIters = 1)
    // codebooks: 8 subspaces × 16 codes, 8-dim sub-centroids
    val shape = cbs.groupBy("subspace").count().as[(Int, Long)].collect().toMap
    assert(shape.keySet === (0 until 8).toSet, shape.toString)
    assert(shape.values.forall(_ === 16L), shape.toString)
    val codes = Similarity.pqEncode(
      emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
      "embedding", cbs, dim = 64, m = 8)
    val rows = codes.select("codes").as[Seq[Int]].collect()
    assert(rows.forall(_.length === 8))
    assert(rows.forall(_.forall(c => c >= 0 && c < 16)))
    // the encode pass is a pure projection: no Exchange between the
    // corpus scan and the codes (the broadcast of the one-row codebook
    // pack is the only exchange in the plan)
    val p = codes.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("pqTopK: reconstruction quality — ADC approx of a vector against itself") {
    // encode-decode sanity on the declared operating point (m=16 on
    // 64-dim unit vectors): a vector's ADC score against its own codes
    // approximates cos=1. Near-random synthetic vectors are the hardest
    // case for 4-dim/16-code quantization (~0.67 recovered on this
    // fixture); the floor pins that MOST of the signal survives — enough
    // for true neighbors to clear the refine cut, which the q50 recall
    // harness then measures directly (0.86 at sf0.01)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"),
        graft.functions.VectorFunctions.unitNormalize(col("embedding")).as("v"))
    val cbs = Similarity.pqCodebooks(emb, "id", "v", dim = 64, m = 16, k = 16,
      trainN = 256, nIters = 2)
    val codes = Similarity.pqEncode(
      emb.select(col("id").as("neighbor_id"), col("v")), "v", cbs,
      dim = 64, m = 16)
    // decode = mean sub-centroid reconstruction; self-dot via the join
    val packed = cbs.groupBy("subspace")
      .agg(array_sort(collect_list(struct(col("code"), col("centv")))).as("cb"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("cb")))).as("__cb"))
    val selfSim = emb.join(codes, emb("id") === codes("neighbor_id"))
      .crossJoin(broadcast(packed))
      .select(aggregate(zip_with(col("codes"), col("__cb"), (c, jcb) =>
          graft.functions.VectorFunctions.dot(
            slice(col("v"), jcb.getField("subspace") * 4 + 1, lit(4)),
            element_at(jcb.getField("cb"), c + 1).getField("centv"))),
        lit(0.0), (acc, x) => acc + x).as("s"))
      .agg(avg("s")).as[Double].head()
    assert(selfSim > 0.6, s"mean self-ADC $selfSim too lossy")
  }

  test("multi-table near-dup LSH reaches full recall vs the exact pairs (sf0.01)") {
    // the q51 configuration: per-pair miss (1 - p²)^32 < 3e-7 at cos 0.35
    val d = "/root/testdata/sf0.01"
    val emb = graft.Tables.embeddings(spark, d)
    val lsh = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.35,
      nBits = 2, nTables = 32)
    val exact = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
        col("id_a") < col("id_b"))
      .withColumn("sim", round(
        graft.functions.CosineSimilarityExpr.cosineSim(col("va"), col("vb")), 4))
      .filter(col("sim") >= 0.35)
      .select("id_a", "id_b", "sim")
    assert(exact.exceptAll(lsh).count() === 0 && lsh.exceptAll(exact).count() === 0)
  }

  test("cosineNearDupPairs finds the tight pair at high threshold") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.98, nBits = 2)
      .as[(Long, Long, Double)].collect().toSeq
    // (1,4) are 0.9/0.1 vs 0.8/0.2 — cosine ≈ 0.9923; must appear if same bucket
    // (0,1) cosine ≈ 0.9939
    assert(pairs.forall(_._3 >= 0.98))
  }

  test("lshTopKMd5: identical vectors always collide; neighbors ranked by rounded sim") {
    // identical vectors project identically under any hyperplane family,
    // so a clone is guaranteed in its twin's bucket and ranks first at
    // sim 1.0; all outputs obey the shared rankTopK contract
    val dup = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)), (3L, Seq(-1.0f, 0.2f, 0.4f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopKMd5(dup, dup.filter(col("vec_id") === 0),
        "vec_id", "embedding", 2, nBits = 2)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.head._2 === 1L && out.head._3 === 1.0)
    assert(out.map(_._4) === (1L to out.length).toSeq)
  }

  test("pqTopKDeterministic: clones encode identically and rank first; rankTopK contract holds") {
    // a clone has byte-identical unit slices → identical codes → the
    // highest possible ADC approx for its twin, so it must survive the
    // refine window and rank first at exact sim 1.0
    val dup = Seq(
      (0L, Seq(1.0f, 0.0f, 0.3f, 0.2f)), (1L, Seq(1.0f, 0.0f, 0.3f, 0.2f)),
      (2L, Seq(0.2f, 0.9f, 0.0f, 0.1f)), (3L, Seq(-1.0f, 0.2f, 0.4f, 0.0f)),
      (4L, Seq(0.1f, 0.2f, 0.9f, 0.4f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqTopKDeterministic(dup, dup.filter(col("vec_id") === 0),
        "vec_id", "embedding", 2, dim = 4, m = 2, kCodes = 4, refine = 2)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.head._2 === 1L && out.head._3 === 1.0)
    assert(out.map(_._4) === (1L to out.length).toSeq)
  }

  test("semDedup: high-sim duplicate groups collapse to one representative per group") {
    // the regime SemDeDup targets — near-identical vectors: two dup
    // groups ({0,1,2} around +x, {10,11} around +y) plus singletons.
    // Group members are at cos > 0.999 of each other, so wherever the
    // centroids fall each group shares a cell and the kept set must
    // equal the exact graph's.
    val dup = Seq(
      (0L, Seq(1.0f, 0.00f, 0.0f)), (1L, Seq(1.0f, 0.01f, 0.0f)),
      (2L, Seq(1.0f, 0.00f, 0.01f)),
      (10L, Seq(0.0f, 1.0f, 0.00f)), (11L, Seq(0.0f, 1.0f, 0.01f)),
      (20L, Seq(-1.0f, 0.0f, 0.0f)), (21L, Seq(0.0f, -1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.md5SeededCentroids(dup, "vec_id", "embedding", 3)
    val out = Staged.withStaged {
      Similarity.semDedup(dup, "vec_id", "embedding", cents, 0.99)
        .as[(Long, Long)].collect().toMap
    }
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 21L))
  }

  test("semDedup keep-superset law vs the exact θ-graph (sf0.01 embeddings, q92 parameters)") {
    // semDedup's pair graph is a SUBSET of the exact all-pairs θ-graph
    // (within-cell only, exact verify → no false pairs), so its CC
    // components refine the exact ones and every doc the exact graph
    // keeps stays kept — the approximation can only keep MORE, never
    // over-delete. This is the quantitative contract behind q92.
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val labels = Staged.withStaged {
      Similarity.semDedup(e, "vec_id", "embedding",
        Similarity.md5SeededCentroids(e, "vec_id", "embedding", 8), 0.35)
        .as[(Long, Long)].collect().toMap
    }
    assert(labels.size === e.count()) // one row per doc, singletons included
    // label sanity: sem_cluster <= doc, and every label is itself kept
    assert(labels.forall { case (doc, c) => c <= doc })
    assert(labels.values.toSet.forall(c => labels(c) == c))
    // exact graph keep set (min-label CC over the all-pairs θ-graph)
    val exactPairs = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
        col("id_a") < col("id_b"))
      .filter(round(graft.functions.CosineSimilarityExpr.cosineSim(
        col("va"), col("vb")), 4) >= 0.35)
      .select("id_a", "id_b")
    val exactLabels = Staged.withStaged {
      Dedup.duplicateClusters(exactPairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
    }
    val exactKept = labels.keySet.filter(d => exactLabels.getOrElse(d, d) == d)
    val semKept = labels.keySet.filter(d => labels(d) == d)
    assert(exactKept.subsetOf(semKept),
      s"over-deleted: ${(exactKept -- semKept).take(5)}")
    // and the approximation actually bites at this θ on real data: it
    // must still collapse a meaningful share of the exact graph's dupes
    val exactDropped = labels.keySet.size - exactKept.size
    val semDropped = labels.keySet.size - semKept.size
    assert(exactDropped > 0, "fixture lost its θ=0.35 pairs")
    assert(semDropped > 0, "semDedup collapsed nothing — cells too fine")
  }

  test("kmeansDeterministic: assignment total+unique, groups separate after the update round") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    // seed choice is the md5-smallest 2 ids — computed here so the
    // fixture can put one seed in each direction group regardless of
    // which ids md5 happens to favor
    val ids = (1L to 6L).toSeq
    val order = ids.sortBy(i => (md5hex(i.toString), i))
    val (seedA, seedB) = (order(0), order(1))
    val groupA = Seq(seedA) ++ order.drop(2).take(2) // direction ~(1, 0)
    val groupB = Seq(seedB) ++ order.drop(4)         // direction ~(0, 1)
    val vecs =
      groupA.zip(Seq(Seq(1.0f, 0.0f), Seq(0.9f, 0.1f), Seq(0.8f, 0.2f))) ++
      groupB.zip(Seq(Seq(0.0f, 1.0f), Seq(0.1f, 0.9f), Seq(0.2f, 0.8f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansDeterministic(df, "vec_id", "embedding",
        n = 2, rounds = 1)
      .as[(Long, Long)].collect()
    assert(out.length === ids.length)          // one assignment per vector
    val m = out.toMap
    assert(m.keySet === ids.toSet)
    groupA.foreach(i => assert(m(i) === seedA, s"vec $i: ${m(i)} != $seedA"))
    groupB.foreach(i => assert(m(i) === seedB, s"vec $i: ${m(i)} != $seedB"))
  }

  test("indexBalanceAudit: counts conserve, loads read imbalance, balanced cells sit at 10^4") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    // two direction groups with a 6:2 skew; seeds adaptively one per
    // group (the kmeans-spec trick) so both cells are live
    val ids = (1L to 8L).toSeq
    val order = ids.sortBy(i => (md5hex(i.toString), i))
    val (seedA, seedB) = (order(0), order(1))
    val hot = Seq(seedA) ++ order.drop(2).take(5) // 6 vectors → hot cell
    val cold = Seq(seedB) ++ order.drop(7)        // 2 vectors
    val vecs = hot.map((_, Seq(1.0f, 0.0f))) ++ cold.map((_, Seq(0.0f, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.indexBalanceAudit(df, "vec_id", "embedding",
        Similarity.md5SeededCentroids(df, "vec_id", "embedding", 2))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.values.map(_._2).sum === 8L)            // occupancy conserves
    assert(out(seedA)._2 === 6L && out(seedB)._2 === 2L)
    assert(out(seedA)._3 === 7500L && out(seedB)._3 === 2500L) // share_bp
    // load: 6·2·10⁴/8 = 15000 (1.5× probe cost), 2·2·10⁴/8 = 5000
    assert(out(seedA)._4 === 15000L && out(seedB)._4 === 5000L)
    // a perfectly balanced split reads exactly 10⁴ everywhere
    val bal = (Seq(seedA) ++ order.drop(2).take(3)).map((_, Seq(1.0f, 0.0f))) ++
      (Seq(seedB) ++ order.drop(5).take(3)).map((_, Seq(0.0f, 1.0f)))
    val bdf = bal.toDF("vec_id", "embedding")
    val bout = Similarity.indexBalanceAudit(bdf, "vec_id", "embedding",
        Similarity.md5SeededCentroids(bdf, "vec_id", "embedding", 2))
      .as[(Long, Long, Long, Long)].collect()
    assert(bout.forall(_._4 === 10000L))
  }

  test("ivfHardNegativesDeterministic ≡ unfiltered search over the label-complement slice; no neighbor shares the query's label") {
    import org.apache.spark.sql.functions._
    val labeled = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.0f, 1.0f), 1), (3L, Seq(-1.0f, 0.0f), 1),
      (4L, Seq(0.8f, 0.2f), 0), (5L, Seq(0.1f, 0.9f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.md5SeededCentroids(labeled, "vec_id", "embedding", 2)
    val hard = Similarity.ivfHardNegativesDeterministic(labeled, labeled,
      "vec_id", "embedding", "label", 2, cents, nProbe = 2)
    val byQuery = labeled.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val neigh = hard.select("query_id", "label", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(neigh.nonEmpty)
    // the carried label is the NEIGHBOR's, and it never equals the query's
    assert(neigh.forall { case (q, l, n) => byQuery(n) == l && byQuery(q) != l })
    // ≡ unfiltered search with the corpus sliced to the OTHER label —
    // the commute law that makes the ≠ filter exact, not a rerank
    val bySlice = Seq(0, 1).map { l =>
      val complement = labeled.filter(col("label") =!= l)
      Similarity.ivfTopKDeterministic(complement,
        labeled.filter(col("label") === l), "vec_id", "embedding", 2,
        cents, nProbe = 2).withColumn("label", lit(1 - l))
        .select("query_id", "label", "neighbor_id", "sim", "rk")
    }.reduce(_ union _)
    assert(hard.exceptAll(bySlice).count() === 0 &&
      bySlice.exceptAll(hard).count() === 0)
    // the hardest negative is the geometric near-miss: query 0 (label 0,
    // pointing at +x) must rank vector 5 (label 1, mostly +y) above the
    // antipodal vector 3
    val q0 = neigh.collect { case (0L, _, n) => n }
    assert(q0.contains(5L) )
  }

  test("clusterTopTermsDeterministic: cell-specific vocabulary outranks corpus-wide terms; every-cell terms score zero") {
    import org.apache.spark.sql.functions._
    // two geometric groups; 'alpha*' words live in group A's documents,
    // 'beta*' in B's, 'common' in every document of both
    val vecs = ((0L to 3L).map(i => (i, Seq(1.0f, 0.01f * i))) ++
      (4L to 7L).map(i => (i, Seq(0.01f * (i - 4), 1.0f)))).toDF("vec_id", "embedding")
    val docs = ((0L to 3L).map(i => (i, s"common alpha$i alpha$i alphaX")) ++
      (4L to 7L).map(i => (i, s"common beta$i beta$i betaX"))).toDF("doc_id", "text")
    val cents = Similarity.md5SeededCentroids(vecs, "vec_id", "embedding", 2)
    val out = Similarity.clusterTopTermsDeterministic(docs, vecs,
        "doc_id", "text", "vec_id", "embedding", cents, 3)
      .as[(Long, Long, String, Long, Double)].collect()
    val byCell = out.groupBy(_._1)
    assert(byCell.size === 2)
    byCell.foreach { case (_, rows) =>
      val top = rows.minBy(_._2)
      // the cell's head term is its own vocabulary, never the shared one
      assert(top._3.startsWith("alpha") || top._3.startsWith("beta"), top.toString)
      assert(rows.forall(r => r._3 != "common" || r._5 === 0.0),
        s"'common' must score ln(1)=0: ${rows.toSeq}")
      // one cell's terms never bleed into the other's top-k
      val fams = rows.map(_._3.take(4)).toSet - "comm"
      assert(fams.size === 1, rows.toSeq.toString)
    }
  }

  test("clusterSeparation: separated blobs read tight, boundary points read near 10000") {
    import spark.implicits._
    // two blobs around (0,0) and (100,100); centroid seeds are the
    // md5-smallest ids — fixed geometry regardless of which two win
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val blobs = Seq(
      (1L, v(0, 0)), (2L, v(1, 0)), (3L, v(0, 1)),
      (4L, v(100, 100)), (5L, v(101, 100)), (6L, v(100, 101)))
      .toDF("vec_id", "embedding")
    // one explicit centroid per blob (clusterSeparation takes ANY
    // centroid table; md5 seeding can draw both seeds from one blob,
    // which is a seeding property, not the audit's)
    val cents = Seq((10L, v(0, 0)), (20L, v(100, 100)))
      .toDF("centroid_id", "centv")
    val sep = Similarity.clusterSeparation(blobs, "vec_id", "embedding", cents)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(sep.map(_._2).sum === 6L, "every point lands in a cell")
    // whichever seeds were drawn, the two blobs are ~141 apart and
    // ~1 wide: intra ≪ nearest-other everywhere
    sep.foreach { c =>
      assert(c._5.exists(_ < 2000L), s"blob cells must read tight: $c") }
    // degenerate geometry: all points identical -> both distances 0,
    // the nearest-other sum is 0 and the ratio is honestly NULL
    val flat = (1L to 4L).map(i => (i, v(5, 5))).toDF("vec_id", "embedding")
    val fc = Similarity.md5SeededCentroids(flat, "vec_id", "embedding", 2)
    val f = Similarity.clusterSeparation(flat, "vec_id", "embedding", fc)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(f.forall(_._5.isEmpty), f.mkString(","))
  }

  test("clusterSeparation equals a plain-Scala quantized-L2 reference on generated vectors") {
    import spark.implicits._
    val gen = for {
      n <- org.scalacheck.Gen.choose(4, 30)
      vs <- org.scalacheck.Gen.listOfN(n,
        org.scalacheck.Gen.listOfN(4,
          org.scalacheck.Gen.choose(-100, 100).map(_ / 10.0f)))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (seed <- 1 to 4) {
      val vs = gen.pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong))
      val k = 3
      val cents = vs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(k)
      def q(a: Array[Float]) = a.map(x => math.round(x.toDouble * 10000))
      def d2(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val per = vs.map { case (id, v) =>
        val ds = cents.map { case (cid, cv) => (d2(q(v), q(cv)), cid) }.sorted
        (ds.head._2, ds.head._1, ds(1)._1)
      }
      val want = per.groupBy(_._1).map { case (cell, xs) =>
        val si = xs.map(_._2).sum; val so = xs.map(_._3).sum
        cell -> ((xs.size.toLong, si, so,
          if (so == 0) None else Some(si * 10000 / so)))
      }
      val got = Similarity.clusterSeparation(
          vs.toDF("vec_id", "embedding").repartition(5), "vec_id", "embedding",
          Similarity.md5SeededCentroids(
            vs.toDF("vec_id", "embedding"), "vec_id", "embedding", k))
        .as[(Long, Long, Long, Long, Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
      assert(got === want, s"seed=$seed")
    }
  }
}
