package graft.ops

import graft.functions.VectorFunctions._
import graft.functions.CosineSimilarityExpr.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north star). Two tiers:
  *   - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *     set against the full corpus; O(Q·N·dim) but embarrassingly
  *     parallel and shuffle-free until the final per-query top-k.
  *   - [[lshTopK]] — scale path: both sides bucketed by deterministic
  *     random-hyperplane LSH; candidate generation is an equi-join on
  *     the bucket id, so the pair count drops from Q·N to Q·bucket size.
  *
  * Results round similarity to 4 decimals *before* ranking so ordering is
  * reproducible across engines/float paths; ties break on corpus id.
  */
object Similarity {

  /** The shared score→rank→truncate tail of every ANN variant. This is
    * where the cross-engine determinism contract lives — round(sim, 4)
    * BEFORE ranking, ties broken on neighbor_id, rank cast to long — so
    * a tweak applied to one variant cannot silently diverge the others
    * (q50 compares methods under these exact rules). */
  /** `carryOut` columns ride into the output between query_id and the
    * neighbor columns. The sim is [[graft.functions.Num.round4]]ed —
    * rounded 4dp with the `+ 0.0` IEEE negative-zero collapse — before
    * it becomes the rank key (the q54/q88/q103/q112 parity lesson: a
    * near-zero sim rounds to -0.0 or 0.0 by engine summation-order
    * luck; the oracle hash distinguishes the zeros AND DuckDB's sort
    * splits them apart while Spark's row write normalizes, so the
    * collapse must land before ORDER BY on both sides). Every variant's
    * oracle mirrors `+ 0.0` in its sim CTE. */
  private def rankTopK(candidates: DataFrame, k: Int,
                       carryOut: Seq[String] = Nil): DataFrame = {
    val scored = candidates
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", graft.functions.Num.round4(cosineSim(col("qv"), col("cv"))))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
      .select((Seq("query_id") ++ carryOut ++ Seq("neighbor_id", "sim", "rk")).map(col): _*)
  }

  /** Exact top-k cosine neighbors for each row of `queries` (small,
    * broadcast) against `corpus`. Excludes self-matches on id equality. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    rankTopK(c.crossJoin(broadcast(q)), k)
  }

  /** LSH-bucketed approximate top-k: only candidates sharing a
    * `nBits`-bit hyperplane signature bucket are scored. With B buckets
    * the scored-pair count is ~Q·nProbe·N/B. Recall is tuned by `nProbe`
    * (multi-probe: each query also probes the nProbe-1 buckets reached by
    * flipping its smallest-|projection| bits — the likeliest sign errors)
    * without re-bucketing the corpus; probe buckets are distinct, so no
    * candidate pair is scored twice and no dedup pass is needed.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nBits: Int = 8, nProbe: Int = 1): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(lshProbes(col(vecCol), nBits, nProbe)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    rankTopK(c.join(q, "bucket"), k)
  }

  /** All centroids packed into ONE row holding an
    * `array<struct<centroid_id, centv>>` column — the shape that lets
    * nearest-centroid selection run as a pure per-row expression over a
    * broadcast of a single row, instead of a join + window. */
  private def packCentroids(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(col("centroid_id"), col("centv"))).as("__cents"))

  /** Per-centroid score structs `(−sim, centroid_id)` for vector `v`
    * against the packed `__cents` array. Ascending struct order is then
    * exactly the old window contract `orderBy(sim.desc, centroid_id)`:
    * `array_min` = nearest centroid, `array_sort` head = probe order.
    * Null sims (zero vectors) coalesce to −(−2) = 2 so they sort last,
    * like desc_nulls_last did. */
  private def centroidScores(v: Column): Column =
    transform(col("__cents"), ce =>
      struct(negate(coalesce(cosineSim(v, ce.getField("centv")), lit(-2.0))).as("ns"),
        ce.getField("centroid_id").as("centroid_id")))

  /** One Lloyd step: assign every corpus vector to its nearest centroid
    * (expression argmax over the broadcast pack — no shuffle), then
    * replace each centroid with its cell mean. The mean is a
    * posexplode → groupBy(centroid_id, pos) → avg: the per-dimension
    * partial aggregation collapses each map partition to ≤ nCentroids·dim
    * rows before the shuffle, so the exchange is cluster-sized, not
    * data-sized. Cells that capture no points drop out (standard k-means
    * behavior — the live centroid count can only shrink). */
  private def lloydStep(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(broadcast(packCentroids(cents)))
      .select(array_min(centroidScores(col("cv"))).getField("centroid_id")
        .as("centroid_id"), posexplode(col("cv")))
      .groupBy("centroid_id", "pos").agg(avg(col("col")).as("m"))
      .groupBy("centroid_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("centroid_id"),
        transform(col("pm"), s => s.getField("m").cast("float")).as("centv"))

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path. Coarse quantizer: the `nCentroids` corpus vectors with the
    * smallest xxhash64(id) — a deterministic pseudo-random sample with no
    * trained model, no count() pre-pass, and no global window: Catalyst
    * plans orderBy(hash).limit(n) as TakeOrderedAndProject, so every
    * partition keeps only nCentroids candidate rows and the full corpus
    * never funnels through one task. The hash doubles as the centroid id
    * (64-bit, collision-free in practice). `nIters` optional Lloyd
    * rounds ([[lloydStep]]) move the sampled centroids to their cell
    * means — cells then follow data density instead of the sample.
    *
    * Assignment and probing are both PURE EXPRESSIONS over a broadcast
    * one-row centroid pack ([[centroidScores]]): nearest-centroid argmax
    * is `array_min`, the nProbe probe list is `slice(array_sort(…))`.
    * No per-row window, no Exchange anywhere between the corpus scan and
    * the candidate equi-join — the round-3 verdict's top finding was the
    * old window-based argmax shuffling the full corpus (with vectors,
    * ~16× amplified) for a computation with zero cross-row dependency.
    *
    * Scored pairs drop from Q·N to ~Q·nProbe·N/nCentroids. Compared to
    * [[lshTopK]]: IVF adapts to the data distribution (cells follow
    * density) at the cost of the assignment pass; LSH is data-oblivious.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16,
              nProbe: Int = 2, nIters: Int = 0): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, nCentroids, nIters)
    val assigned = assignCells(corpus, idCol, vecCol, centroids)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(packCentroids(centroids)))
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(centroidScores(col("qv"))), 1, nProbe)).as("__p"))
      .select(col("query_id"), col("qv"),
        col("__p").getField("centroid_id").as("centroid_id"))
    rankTopK(assigned.join(probes, "centroid_id"), k)
  }

  /** The coarse-quantizer centroid table `(centroid_id, centv)`: hash-
    * sampled seeds plus `nIters` Lloyd rounds. Public so an index build
    * can materialize centroids once and reuse them across query batches
    * (with [[assignCells]]) instead of re-deriving per query. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nCentroids: Int, nIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val seeded = c
      .select(xxhash64(col("neighbor_id")).as("centroid_id"), col("cv").as("centv"))
      .orderBy("centroid_id").limit(nCentroids)
    (0 until nIters).foldLeft(seeded)((cs, _) => lloydStep(c, cs))
  }

  /** Stage an embedding corpus for SHUFFLE-FREE ANN serving: materialize
    * the LSH bucket id and bucket the table by it at write time — the
    * same pay-the-shuffle-once-at-ingest layout as
    * [[Dedup.writeHashBucketed]]. Every query batch then candidate-joins
    * against the staged table with NO Exchange on the corpus side
    * (`BucketedAnnSpec` counts the exchanges), which is the difference
    * between re-shuffling 100 TB of vectors per query batch and
    * streaming them straight out of the scan. */
  def writeLshBucketed(corpus: DataFrame, idCol: String, vecCol: String,
                       table: String, nBits: Int, nBuckets: Int): Unit =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nBits))
      .write.mode("overwrite").bucketBy(nBuckets, "bucket").sortBy("bucket")
      .saveAsTable(table)

  /** [[lshTopK]] over a [[writeLshBucketed]] staging table —
    * output-identical for the same nBits, but the corpus arrives
    * pre-partitioned on the bucket id so only the (small) probe side
    * ever shuffles. */
  def lshTopKBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int, nBits: Int, nProbe: Int = 1): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(lshProbes(col(vecCol), nBits, nProbe)).as("bucket"))
    rankTopK(spark.table(table).join(q, "bucket"), k)
  }

  /** Nearest-centroid cell per corpus row — the IVF assignment pass.
    * Pure projection over a broadcast one-row centroid pack: NO shuffle,
    * no window, regardless of corpus size. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(packCentroids(centroids)))
      .select(col("neighbor_id"), col("cv"),
        array_min(centroidScores(col("cv"))).getField("centroid_id").as("centroid_id"))

  // ---- Product quantization (the compression half of IVF-PQ) ----
  //
  // At 100 TB of float32 embeddings, the ANN serving scan is I/O-bound on
  // the vectors themselves. PQ stores each vector as m sub-centroid codes
  // (dim 64, m = 8, k = 16 → 8 bytes vs 256: 32×), and queries score
  // against codes via a per-query lookup table (ADC) — the corpus-side
  // scan reads CODES ONLY; full vectors are fetched just for the top
  // refine·k rerank join. Codebooks train on a bounded hash sample, so
  // nothing about training scales with the corpus.

  /** Squared L2 between two float arrays (expression). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ codebooks `(subspace, code, centv)`: `m` subspaces of dim/m dims,
    * `k` codes each. Seeds are the `k` hash-smallest sampled rows' slices
    * (TakeOrderedAndProject — no global window, no count pre-pass);
    * `nIters` Lloyd rounds over the `trainN`-row sample move them to cell
    * means. Only the bounded sample is ever exploded or shuffled. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, k: Int, trainN: Int = 1024,
                  nIters: Int = 2): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    // (__h, id) tiebreak makes the sample cut and the seed window total
    // orders even under hash collisions — same discipline as
    // shuffleShards/quotaPerStratum; 'training is deterministic' (which
    // ivfPqTopKIndexed ≡ ivfPqTopK rests on) must not assume collision
    // absence.
    val sample = corpus
      .select(xxhash64(col(idCol)).as("__h"), col(idCol).as("__sid"),
        col(vecCol).as("cv"))
      .orderBy("__h", "__sid").limit(trainN)
    // staged: the seed selection and EVERY Lloyd round re-consume this
    // frame, and its lineage is a corpus-wide sample scan — without the
    // pin each consumer re-reads the corpus (Staged releases per query)
    val subRows = Staged.stage(sample.select(col("__h"), col("__sid"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("cv"), j * sub + 1, lit(sub)))))
      .toDF("__h", "__sid", "subspace", "subv"))
    val w = Window.partitionBy("subspace").orderBy("__h", "__sid")
    val seeds = subRows
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("subspace"), (col("__rn") - 1).as("code"),
        col("subv").as("centv"))
    val trained = (0 until nIters).foldLeft(seeds) { (cbs, _) =>
      val packed = cbs.groupBy("subspace")
        .agg(collect_list(struct(col("code"), col("centv"))).as("cb"))
      subRows.join(broadcast(packed), "subspace")
        .select(col("subspace"),
          array_min(transform(col("cb"), ce =>
            struct(l2sq(col("subv"), ce.getField("centv")).as("d"),
              ce.getField("code").as("code")))).getField("code").as("code"),
          posexplode(col("subv")))
        .groupBy("subspace", "code", "pos").agg(avg(col("col")).as("mv"))
        .groupBy("subspace", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("subspace"), col("code"),
          transform(col("pm"), s => s.getField("mv").cast("float")).as("centv"))
    }
    // Lloyd rounds DROP cells that capture no sample points (standard
    // k-means shrink), which would leave code values non-contiguous —
    // but the ADC lookup (element_at(lut, code+1)) and the LUT builder
    // are POSITIONAL over the code-sorted codebook array. Renumber codes
    // 0..k'-1 in code order so value == position always holds; encode
    // and LUT both derive from this table, so they stay consistent.
    val wRenum = Window.partitionBy("subspace").orderBy("code")
    // staged: callers consume the codebooks from two plan branches
    // (encode + LUT build); the table is m×k rows — tiny — but its
    // lineage is the whole training loop
    Staged.stage(trained.withColumn("code", row_number().over(wRenum) - 1))
  }

  /** All codebooks packed into ONE broadcastable row:
    * `__cb` = sorted array over subspaces of (subspace, cb[k]). */
  private def packCodebooks(codebooks: DataFrame): DataFrame =
    codebooks.groupBy("subspace")
      .agg(array_sort(collect_list(struct(col("code"), col("centv")))).as("cb"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("cb")))).as("__cb"))

  /** Encode PQ codes: adds a `codes array<int>` column (and drops the
    * vector) — a pure projection over the broadcast codebook pack: no
    * shuffle, no window, at any corpus size. Every other column passes
    * through, so an index build can carry (id, cell id, …) alongside the
    * codes. This is the write-once index build; the staged table a
    * serving layer scans is (id[, cell], codes), m bytes of payload per
    * vector. */
  def pqEncode(corpus: DataFrame, vecCol: String,
               codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    corpus
      .crossJoin(broadcast(packCodebooks(codebooks)))
      .withColumn("codes",
        transform(col("__cb"), jcb =>
          array_min(transform(jcb.getField("cb"), ce =>
            struct(l2sq(
                slice(col(vecCol), jcb.getField("subspace") * sub + 1, lit(sub)),
                ce.getField("centv")).as("d"),
              ce.getField("code").as("code")))).getField("code")))
      .drop("__cb", vecCol)
  }

  /** PQ approximate top-k with exact rerank: per query build the m×k
    * lookup table lut[j][c] = <q_j, centv_{j,c}> once (ADC), score every
    * corpus row by summing code lookups — the scan touches codes only —
    * keep the `refine`·k best per query, join their real vectors back,
    * and rerank exactly under [[rankTopK]]'s contract. Queries (bounded)
    * broadcast with their LUTs; the only corpus-sized movement is the
    * per-query top-refine·k window over (id, approx) rows. Cosine metric:
    * both sides are unit-normalized for encode/ADC (dot ≡ cosine), the
    * rerank reads original vectors. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int, m: Int = 8, kCodes: Int = 16,
             refine: Int = 4, trainN: Int = 1024, nIters: Int = 2): DataFrame = {
    val sub = dim / m
    val unitCorpus = corpus.select(col(idCol).as("neighbor_id"),
      unitNormalize(col(vecCol)).as("cv"))
    val cbs = pqCodebooks(unitCorpus, "neighbor_id", "cv", dim, m, kCodes,
      trainN, nIters)
    val codes = pqEncode(unitCorpus, "cv", cbs, dim, m)
    val q = pqLuts(
      queries.select(col(idCol).as("query_id"), unitNormalize(col(vecCol)).as("uq")),
      "uq", cbs, dim, m)
    val cand = adcTopCandidates(codes.crossJoin(broadcast(q)), k * refine)
    val vecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qvecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rankTopK(cand.join(vecs, "neighbor_id").join(broadcast(qvecs), "query_id"), k)
  }

  /** Per-query ADC lookup tables: lut[j][c] = <q_j, centv_{j,c}> —
    * replaces the vector with `lut` (m×k doubles), all other columns
    * pass through. Pure projection over the broadcast codebook pack. */
  private def pqLuts(queries: DataFrame, vecCol: String, codebooks: DataFrame,
                     dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    queries.crossJoin(broadcast(packCodebooks(codebooks)))
      .withColumn("lut",
        transform(col("__cb"), jcb =>
          transform(jcb.getField("cb"), ce =>
            dot(slice(col(vecCol), jcb.getField("subspace") * sub + 1, lit(sub)),
              ce.getField("centv")))).as("lut"))
      .drop("__cb", vecCol)
  }

  /** ADC scan + per-query top-n cut over (codes, lut) candidate rows:
    * score = Σ_j lut[j][codes[j]], keep the n best (approx-desc,
    * id-tiebreak) per query. The window partitions by query — the
    * (id, approx) rows it sorts are the narrowest frame in the plan. */
  private def adcTopCandidates(cand: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("neighbor_id"))
    cand
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx", aggregate(
        zip_with(col("codes"), col("lut"), (c, l) => element_at(l, c + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .select("query_id", "neighbor_id")
  }

  /** IVF-PQ: the full FAISS-style composition — IVF cells prune WHICH
    * rows are scored (≈ nProbe/nCentroids of the corpus), PQ codes
    * decide HOW they're scored (ADC over m-byte codes, no vectors), and
    * the top refine·k per query rerank exactly from the real vectors.
    * The serving table this models is (centroid_id, neighbor_id, codes):
    * bucketed by cell at write time, the probe is an equi-join on the
    * cell id and the scan I/O is codes-only — the two scale levers
    * (which rows / how many bytes per row) compose independently. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, dim: Int, nCentroids: Int = 16,
                nProbe: Int = 2, m: Int = 8, kCodes: Int = 16,
                refine: Int = 4, trainN: Int = 1024, nIters: Int = 2): DataFrame = {
    // float cast: the IVF side (centroidScores) runs the native
    // cosine_sim expression, which is typed array<float>
    val unitCorpus = corpus.select(col(idCol).as("neighbor_id"),
      unitNormalize(col(vecCol)).cast("array<float>").as("cv"))
    // staged: the centroid table feeds both cell assignment and the
    // query probe list; unstaged, each branch re-runs the corpus-wide
    // hash-sample scan behind ivfCentroids
    val centroids = Staged.stage(
      ivfCentroids(unitCorpus, "neighbor_id", "cv", nCentroids))
    val cbs = pqCodebooks(unitCorpus, "neighbor_id", "cv", dim, m, kCodes,
      trainN, nIters)
    // the index: cell assignment + codes in ONE projection pass, no
    // Exchange (both the centroid pack and the codebook pack broadcast)
    val index = pqEncode(
      assignCells(unitCorpus, "neighbor_id", "cv", centroids)
        .select(col("neighbor_id"), col("cv"), col("centroid_id")),
      "cv", cbs, dim, m)
    ivfPqServe(index, centroids, cbs, corpus, queries, idCol, vecCol,
      k, dim, nProbe, m, refine)
  }

  /** The serving half of IVF-PQ over a prebuilt (cell, id, codes) index:
    * build per-query LUTs + probe lists (both pure projections over the
    * broadcast centroid/codebook packs), candidate-join on the cell id,
    * ADC-score, rerank the top refine·k exactly. The index side is
    * whatever the caller hands in — freshly encoded ([[ivfPqTopK]]) or a
    * persisted table ([[ivfPqTopKIndexed]]). */
  private def ivfPqServe(index: DataFrame, centroids: DataFrame,
                         codebooks: DataFrame, corpus: DataFrame,
                         queries: DataFrame, idCol: String, vecCol: String,
                         k: Int, dim: Int, nProbe: Int, m: Int,
                         refine: Int): DataFrame = {
    val uq = queries.select(col(idCol).as("query_id"),
      unitNormalize(col(vecCol)).cast("array<float>").as("uq"))
    val probes = pqLuts(uq, "uq", codebooks, dim, m)
      .join(uq, "query_id")
      .crossJoin(broadcast(packCentroids(centroids)))
      .select(col("query_id"), col("lut"),
        explode(slice(array_sort(centroidScores(col("uq"))), 1, nProbe)).as("__p"))
      .select(col("query_id"), col("lut"),
        col("__p").getField("centroid_id").as("centroid_id"))
    val cand = adcTopCandidates(index.join(broadcast(probes), "centroid_id"),
      k * refine)
    val vecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qvecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rankTopK(cand.join(vecs, "neighbor_id").join(broadcast(qvecs), "query_id"), k)
  }

  /** Materialize the IVF-PQ index: `table` = (centroid_id, neighbor_id,
    * codes) bucketed by cell, plus `<table>_centroids` /
    * `<table>_codebooks` (the tiny model tables serving needs to build
    * probes and LUTs). This is the pay-once index build of a real
    * deployment: training reads a bounded sample, encoding is one
    * no-Exchange projection pass over the corpus, and every subsequent
    * query batch scans m-byte code payloads instead of dim×4-byte
    * vectors. */
  def writeIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      table: String, dim: Int, nCentroids: Int = 16,
                      m: Int = 8, kCodes: Int = 16, nBuckets: Int = 8,
                      trainN: Int = 1024, nIters: Int = 2): Unit = {
    val unitCorpus = corpus.select(col(idCol).as("neighbor_id"),
      unitNormalize(col(vecCol)).cast("array<float>").as("cv"))
    val centroids = ivfCentroids(unitCorpus, "neighbor_id", "cv", nCentroids)
    val cbs = pqCodebooks(unitCorpus, "neighbor_id", "cv", dim, m, kCodes,
      trainN, nIters)
    centroids.write.mode("overwrite").saveAsTable(s"${table}_centroids")
    // encoding below reads the PERSISTED tables, so the in-memory
    // training frames are each consumed exactly once here
    cbs.write.mode("overwrite").saveAsTable(s"${table}_codebooks")
    encodeForIndex(corpus, idCol, vecCol,
      corpus.sparkSession.table(s"${table}_centroids"),
      corpus.sparkSession.table(s"${table}_codebooks"), dim, m)
      .write.mode("overwrite")
      .bucketBy(nBuckets, "centroid_id").sortBy("centroid_id")
      .saveAsTable(table)
  }

  /** The (cell, id, codes) index rows for `corpus` under FROZEN model
    * tables — the shared encode of the initial [[writeIvfPqIndex]] build
    * and the incremental [[appendIvfPqIndex]]: unit-normalize, assign
    * cells against the given centroids (broadcast-pack projection, no
    * shuffle), PQ-encode against the given codebooks (projection). Public
    * so a spec can state the append contract as frame equality. */
  def encodeForIndex(corpus: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, codebooks: DataFrame,
                     dim: Int, m: Int): DataFrame = {
    val unit = corpus.select(col(idCol).as("neighbor_id"),
      unitNormalize(col(vecCol)).cast("array<float>").as("cv"))
    pqEncode(
      assignCells(unit, "neighbor_id", "cv", centroids)
        .select(col("neighbor_id"), col("cv"), col("centroid_id")),
      "cv", codebooks, dim, m)
  }

  /** Fold a new embedding batch into a persisted [[writeIvfPqIndex]]
    * table WITHOUT retraining — the [[graft.ops.IncrementalDedup]] twin
    * of the ANN serving story: a daily embedding drop is encoded against
    * the index's FROZEN centroid/codebook tables (two broadcast-pack
    * projections over the batch — the base index is not even read) and
    * appended to the cell buckets, so the incremental cost is
    * batch-sized, never corpus-sized. After the append the index table
    * is row-identical to encoding base ∪ batch under the same models
    * (`BucketedAnnSpec` pins this), hence serving over it is too.
    *
    * The documented drift caveat: a FULL rebuild would retrain centroids
    * and codebooks on base ∪ batch, giving (slightly) different cells and
    * codes; frozen-model appends trade that refresh for batch-sized cost,
    * and a periodic rebuild re-centers the model — the standard
    * FAISS-style maintenance split. `nBuckets` must match the original
    * build's (Spark rejects a mismatched append). */
  def appendIvfPqIndex(newBatch: DataFrame, idCol: String, vecCol: String,
                       table: String, dim: Int, m: Int = 8,
                       nBuckets: Int = 8): Unit = {
    val spark = newBatch.sparkSession
    encodeForIndex(newBatch, idCol, vecCol,
      spark.table(s"${table}_centroids"),
      spark.table(s"${table}_codebooks"), dim, m)
      .write.mode("append")
      .bucketBy(nBuckets, "centroid_id").sortBy("centroid_id")
      .saveAsTable(table)
  }

  /** [[writeIvfPqIndex]]'s verification twin: same persisted layout
    * (cell-bucketed (centroid_id, neighbor_id, codes) + frozen
    * `_centroids`/`_codebooks` model tables) but the models are
    * md5-seeded ([[md5SeededCentroids]] raw-vector cells per q96,
    * [[md5SeededPqCodebooks]] unit slices per q99) and every encode
    * decision is the deterministic rounded/quantized form, so the WHOLE
    * build → append → serve lifecycle reproduces in DuckDB and the
    * persisted-index family gets a full hash oracle (q120; the
    * production xxhash64/Lloyd q94 keeps its rows-only check). */
  def writeIvfPqIndexDeterministic(corpus: DataFrame, idCol: String,
                                   vecCol: String, table: String, dim: Int,
                                   nCentroids: Int = 16, m: Int = 8,
                                   kCodes: Int = 16, nBuckets: Int = 8): Unit = {
    val spark = corpus.sparkSession
    md5SeededCentroids(corpus, idCol, vecCol, nCentroids)
      .write.mode("overwrite").saveAsTable(s"${table}_centroids")
    md5SeededPqCodebooks(corpus, idCol, vecCol, dim, m, kCodes)
      .write.mode("overwrite").saveAsTable(s"${table}_codebooks")
    encodeForIndexDeterministic(corpus, idCol, vecCol,
      spark.table(s"${table}_centroids"),
      spark.table(s"${table}_codebooks"), dim, m)
      .write.mode("overwrite")
      .bucketBy(nBuckets, "centroid_id").sortBy("centroid_id")
      .saveAsTable(table)
  }

  /** [[encodeForIndex]]'s deterministic twin under GIVEN frozen models:
    * cell = rounded-cosine argmax over the raw vector
    * ([[assignCellsRounded]], q96's contract), codes = ×10⁴-quantized
    * l2 argmin with code tiebreak over the unit-normalized vector
    * (q99's contract). Shared by the initial build and the append, so
    * append ≡ fresh-encode-of-union holds by construction
    * (`BucketedAnnSpec` pins it as frame equality). */
  def encodeForIndexDeterministic(corpus: DataFrame, idCol: String,
                                  vecCol: String, centroids: DataFrame,
                                  codebooks: DataFrame,
                                  dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    assignCellsRounded(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")),
        "neighbor_id", "__v", centroids)
      .withColumn("uv", unitNormalize(col("cv")))
      .crossJoin(broadcast(packCodebooks(codebooks)))
      .select(col("centroid_id"), col("neighbor_id"),
        transform(col("__cb"), jcb =>
          array_min(transform(jcb.getField("cb"), ce =>
            struct(round(l2sq(
                slice(col("uv"), jcb.getField("subspace") * sub + 1, lit(sub)),
                ce.getField("centv")) * 10000).cast("long").as("d"),
              ce.getField("code").as("code")))).getField("code")).as("codes"))
  }

  /** [[appendIvfPqIndex]]'s deterministic twin: encode the batch against
    * the persisted FROZEN md5-seeded models (batch-sized cost, base
    * never re-read) and append into the cell buckets. */
  def appendIvfPqIndexDeterministic(newBatch: DataFrame, idCol: String,
                                    vecCol: String, table: String, dim: Int,
                                    m: Int = 8, nBuckets: Int = 8): Unit = {
    val spark = newBatch.sparkSession
    encodeForIndexDeterministic(newBatch, idCol, vecCol,
      spark.table(s"${table}_centroids"),
      spark.table(s"${table}_codebooks"), dim, m)
      .write.mode("append")
      .bucketBy(nBuckets, "centroid_id").sortBy("centroid_id")
      .saveAsTable(table)
  }

  /** The deterministic serve over a [[writeIvfPqIndexDeterministic]]
    * table: probe list under the rounded metric ([[probeCells]], q96),
    * ×10⁴-integer ADC LUTs (q99 — integer sums are order-independent),
    * codes-only approx scan, exact [[rankTopK]] rerank. */
  def ivfPqTopKIndexedDeterministic(spark: org.apache.spark.sql.SparkSession,
                                    table: String, corpus: DataFrame,
                                    queries: DataFrame, idCol: String,
                                    vecCol: String, k: Int, dim: Int,
                                    nProbe: Int = 2, m: Int = 8,
                                    refine: Int = 4): DataFrame = {
    val sub = dim / m
    val cents = spark.table(s"${table}_centroids")
    val cbs = spark.table(s"${table}_codebooks")
    val luts = queries
      .select(col(idCol).as("query_id"), unitNormalize(col(vecCol)).as("uq"))
      .crossJoin(broadcast(packCodebooks(cbs)))
      .withColumn("lut", transform(col("__cb"), jcb =>
        transform(jcb.getField("cb"), ce =>
          round(dot(slice(col("uq"), jcb.getField("subspace") * sub + 1, lit(sub)),
            ce.getField("centv")) * 10000).cast("long"))))
      .select("query_id", "lut")
    val probes = probeCells(queries, idCol, vecCol, cents, nProbe)
      .select("query_id", "centroid_id")
      .join(luts, "query_id")
    val cand = adcTopCandidates(
      spark.table(table).join(broadcast(probes), "centroid_id"), k * refine)
    val vecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qvecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rankTopK(cand.join(vecs, "neighbor_id").join(broadcast(qvecs), "query_id"), k)
  }

  /** [[ivfPqTopK]] served from a [[writeIvfPqIndex]] staging table:
    * training and encoding are NOT re-run per query batch — the plan
    * scans the persisted (cell, id, codes) index (codes-only I/O) and
    * the persisted model tables. Output-identical to serving from the
    * same model freshly applied (spec-pinned). */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       table: String, corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int, dim: Int,
                       nProbe: Int = 2, m: Int = 8,
                       refine: Int = 4): DataFrame =
    ivfPqServe(spark.table(table), spark.table(s"${table}_centroids"),
      spark.table(s"${table}_codebooks"), corpus, queries, idCol, vecCol,
      k, dim, nProbe, m, refine)

  /** Embedding-cosine near-duplicate pairs over the whole corpus via LSH
    * buckets, OR-amplified across `nTables` independent hyperplane sets:
    * a pair is a candidate if it shares a bucket in ANY table, so the
    * miss probability per pair is (1 - p^nBits)^nTables where
    * p = 1 - θ/π. Candidates carry ids only (no vectors) through the
    * bucket join and the (id_a, id_b) dedup shuffle; vectors are joined
    * back once per side for the exact cosine verify — at scale this keeps
    * the wide embedding arrays out of the hot self-join entirely.
    *
    * Tuning: for a genuine near-dup threshold (cos ≥ 0.9, θ ≤ 26°),
    * p ≈ 0.86 and a few 8-bit tables give recall ≈ 1 with tiny buckets.
    * For a permissive threshold like the q45/q51 oracle's 0.35 the same
    * construction needs low nBits and many tables (the declared q51 uses
    * nBits = 2, nTables = 32 → per-pair miss < 3e-7) — recall stays
    * verifiable but candidate pruning is weak, which is inherent: random-
    * tail pairs at θ ≈ 70° are not locality-clustered for any LSH family.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nBits: Int = 8,
                         nTables: Int = 1): DataFrame = {
    // staged: the self-join consumes this twice, and the nTables × nBits
    // hyperplane projections behind each bucket id are the expensive part
    // of the whole operator — recomputing them on the probe side doubled
    // q51's cost
    val buckets = Staged.stage(corpus.select(col(idCol).as("id"),
        posexplode(array((0 until nTables).map(t =>
          lshBucket(col(vecCol), nBits, seed = t)): _*)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("sim", graft.functions.Num.round4(cosineSim(col("va"), col("vb"))))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** SemDeDup-style embedding-cluster dedup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * assign every document to its nearest centroid cell, verify exact
    * cosine on WITHIN-CELL pairs only, connected-components the θ-graph,
    * and label each doc with its component's min id — "keep one per
    * semantic cluster" is then `filter(doc === sem_cluster)`. The
    * embedding-side twin of the text pipeline's MinHash-fed dedup: cells
    * play the role LSH bands play there, turning O(N²) verify into
    * Σ n_cell² (size nCentroids with the corpus — SemDeDup runs ~√N
    * cells — and the per-cell verify is an equi-join on the cell id).
    *
    * Plan at scale: assignment is a pure projection over the broadcast
    * centroid pack (no shuffle); the candidate self-join carries IDS ONLY
    * (cell, doc) — the wide vectors join back once per side for the
    * exact verify, exactly like [[cosineNearDupPairs]]; the CC loop is
    * [[Dedup.duplicateClusters]]' checkpointed min-label propagation.
    * Pairs never span cells (a doc lives in exactly one cell), so
    * components are cell-local by construction.
    *
    * Missing cross-cell θ-pairs is the algorithm's documented
    * approximation; because the found pair graph is a SUBSET of the
    * exact one, every doc the exact graph keeps is also kept here
    * (components only split, and each split component's min is itself a
    * component min) — the kept set degrades toward "keep everything",
    * never toward over-deletion (spec-pinned, SimilaritySpec).
    *
    * Determinism for the cross-engine oracle: the argmax is over
    * round(cosine, 4) with centroid-id tiebreak (negate-after-round, so
    * no rounding asymmetry), and q92's centroids are the nCentroids
    * md5(id)-smallest corpus vectors — both reproducible bit-identically
    * in DuckDB, making the full (doc, sem_cluster) table hash-checkable.
    *
    * Output: (doc, sem_cluster) for EVERY corpus row; singletons label
    * themselves.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, theta: Double,
               maxIter: Int = 20): DataFrame = {
    // staged: the candidate join consumes the assignment twice, and its
    // lineage is the full centroid-scoring projection
    val cells = Staged.stage(
      assignCellsRounded(corpus, idCol, vecCol, centroids)
        .select(col("neighbor_id").as("doc"), col("centroid_id").as("cell")))
    val cand = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val pairs = cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .filter(round(cosineSim(col("va"), col("vb")), 4) >= theta)
      .select("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs, "id_a", "id_b", maxIter)
    corpus.select(col(idCol).as("doc"))
      .join(clusters, Seq("doc"), "left_outer")
      .select(col("doc"), coalesce(col("cluster"), col("doc")).as("sem_cluster"))
  }

  /** The md5(id)-smallest `n` corpus vectors as a centroid table — the
    * deterministic, cross-engine-reproducible seeding [[semDedup]]'s
    * oracle needs (DuckDB computes the same md5 ordering; xxhash64 is
    * Spark-only). TakeOrderedAndProject — no global sort. */
  def md5SeededCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                         n: Int): DataFrame =
    corpus.select(col(idCol).as("centroid_id"), col(vecCol).as("centv"))
      .orderBy(md5(col("centroid_id").cast("string")), col("centroid_id"))
      .limit(n)

  /** Full deterministic Lloyd k-means: md5 seeds → `rounds` ×
    * (assign → quantized-mean update) → final assignment. The oracle
    * twin of [[ivfCentroids]]' training loop (whose xxhash seeds and
    * raw-float means are Spark-only): every decision an engine could
    * diverge on is pinned —
    *   - assignment argmax runs on the 4dp-ROUNDED cosine with id
    *     tiebreaks ([[assignCellsRounded]], q96's proven metric);
    *   - the centroid update is the q99/q102 INTEGER discipline applied
    *     to the mean: each member coordinate quantizes to a ×10⁴ BIGINT,
    *     the per-cell sum is exact integer arithmetic (order-independent
    *     where a float sum is not), and the mean is one double division
    *     — then cast to FLOAT (IEEE round-to-nearest, identical in any
    *     engine) because vectors are float-typed corpus-wide;
    *   - an emptied cell vanishes from the update exactly as a SQL
    *     GROUP BY drops it.
    * Scale: per round, one broadcast-pack assignment projection (zero
    * corpus Exchange, [[assignCellsRounded]]) + one (cell, pos)-grain
    * aggregate — cluster-count-sized state, map-side partials; the
    * corpus vectors never shuffle. Output: (neighbor_id, centroid_id)
    * under the final centroids. */
  def kmeansDeterministic(corpus: DataFrame, idCol: String, vecCol: String,
                          n: Int, rounds: Int = 1): DataFrame = {
    val emb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val finalCents = (1 to rounds).foldLeft(
        md5SeededCentroids(corpus, idCol, vecCol, n)) {
      (cents, _) => roundedLloydUpdate(emb, cents)
    }
    assignCellsRounded(emb, "neighbor_id", "cv", finalCents)
      .select(col("neighbor_id"), col("centroid_id"))
  }

  /** One quantized-mean Lloyd update under the rounded metric (the
    * deterministic twin of [[lloydStep]]): assign members, then per
    * (cell, pos) sum ×10⁴-quantized coordinates exactly and divide
    * once. Rebuilds `centv` in position order as a float array. */
  private def roundedLloydUpdate(emb: DataFrame, cents: DataFrame): DataFrame =
    assignCellsRounded(emb, "neighbor_id", "cv", cents)
      .select(col("centroid_id"), posexplode(col("cv")).as(Seq("pos", "v")))
      .groupBy("centroid_id", "pos")
      .agg(sum(round(col("v").cast("double") * 10000).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .groupBy("centroid_id")
      .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s") / (lit(10000.0) * col("n"))).as("m")))),
          x => x.getField("m"))
        .cast("array<float>").as("centv"))

  /** Per-centroid (negated-rounded-cosine, centroid_id) structs — the
    * CROSS-ENGINE-DETERMINISTIC scoring [[assignCellsRounded]],
    * [[semDedup]] and [[ivfTopKDeterministic]] share: rounding to 4dp
    * BEFORE the argmax/sort (negate-after-round, so no rounding
    * asymmetry) makes the cell choice reproducible in any engine that
    * computes a 4dp cosine, where the production [[centroidScores]]'
    * raw doubles are float-path-sensitive. */
  private def roundedCentroidScores(v: Column): Column =
    transform(col("__cents"), ce =>
      // zcollapse AFTER negate: a +0.0-rounded cosine would otherwise
      // negate to -0.0 and sort apart from a -0.0-cosine's +0.0 inside
      // array_min's struct ordering (expression eval sees raw IEEE
      // doubles — row-write normalization hasn't happened yet)
      struct(graft.functions.Num.zcollapse(negate(round(coalesce(
          cosineSim(v, ce.getField("centv")), lit(-2.0)), 4))).as("ns"),
        ce.getField("centroid_id").as("centroid_id")))

  /** [[assignCells]] under the rounded deterministic metric — same
    * broadcast-pack projection (no shuffle at any corpus size), same
    * output shape (neighbor_id, cv, centroid_id). `carry` columns ride
    * the projection unchanged (metadata a filtered search scopes on —
    * at scale they live IN the cell-bucketed index row, not behind a
    * corpus-sized join-back). */
  def assignCellsRounded(corpus: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame,
                         carry: Seq[String] = Nil): DataFrame =
    corpus.select(col(idCol).as("neighbor_id") +: col(vecCol).as("cv")
        +: carry.map(col): _*)
      .crossJoin(broadcast(packCentroids(centroids)))
      .select(col("neighbor_id") +: col("cv")
        +: array_min(roundedCentroidScores(col("cv")))
          .getField("centroid_id").as("centroid_id")
        +: carry.map(col): _*)

  /** md5-seeded, NO-LLOYD PQ codebooks `(subspace, code, centv)`: the
    * kCodes md5(id)-smallest unit-normalized corpus vectors, sliced into
    * m subspaces; code = the seed's md5 rank, so the whole table is
    * reproducible in DuckDB (the verification-twin role [[pqCodebooks]]'
    * xxhash sampling + Lloyd rounds can't play). The window runs over
    * the kCodes-row LIMIT result — never the corpus. */
  def md5SeededPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                           dim: Int, m: Int, kCodes: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    // TakeOrderedAndProject sample, then rank via a single-row
    // collect+sort aggregate over the kCodes-row result — bounded by
    // construction, so no global window enters the plan (PlanSpec bans
    // empty-partition windows across the ANN family)
    val seeds = corpus
      .select(md5(col(idCol).cast("string")).as("__m"), col(idCol).as("__sid"),
        unitNormalize(col(vecCol)).as("cv"))
      .orderBy("__m", "__sid").limit(kCodes)
    seeds
      .agg(array_sort(collect_list(struct(col("__m"), col("__sid"), col("cv")))).as("a"))
      .select(posexplode(col("a")))
      .select(col("pos").as("code"), col("col.cv").as("cv"))
      .select(col("code"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("cv"), j * sub + 1, lit(sub)))))
      .toDF("code", "subspace", "centv")
  }

  /** [[pqTopK]]'s verification twin: same ADC plan shape (broadcast
    * codebook pack → projection encode → per-query LUT → codes-only
    * approx scan → top-refine·k window → exact rerank) but the codebooks
    * are [[md5SeededPqCodebooks]] (no Lloyd) and every scoring decision
    * — encode argmin, LUT entries, hence the approx sums — is quantized
    * to INTEGERS (×10⁴, ties-away-from-zero rounding, which Spark and
    * DuckDB share) with code/id tiebreaks: integer sums are
    * order-independent where float sums are not, so the whole
    * product-quantized search reproduces in DuckDB and gets a full hash
    * oracle (q99; the production trained q82/q83 keep rows-only + q50
    * recall floors). */
  def pqTopKDeterministic(corpus: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, k: Int, dim: Int,
                          m: Int = 8, kCodes: Int = 16,
                          refine: Int = 4): DataFrame = {
    val sub = dim / m
    val pack = packCodebooks(md5SeededPqCodebooks(corpus, idCol, vecCol, dim, m, kCodes))
    val codes = corpus
      .select(col(idCol).as("neighbor_id"), unitNormalize(col(vecCol)).as("cv"))
      .crossJoin(broadcast(pack))
      .select(col("neighbor_id"),
        transform(col("__cb"), jcb =>
          array_min(transform(jcb.getField("cb"), ce =>
            struct(round(l2sq(
                slice(col("cv"), jcb.getField("subspace") * sub + 1, lit(sub)),
                ce.getField("centv")) * 10000).cast("long").as("d"),
              ce.getField("code").as("code")))).getField("code")).as("codes"))
    val q = queries
      .select(col(idCol).as("query_id"), unitNormalize(col(vecCol)).as("uq"))
      .crossJoin(broadcast(pack))
      .withColumn("lut", transform(col("__cb"), jcb =>
        transform(jcb.getField("cb"), ce =>
          round(dot(slice(col("uq"), jcb.getField("subspace") * sub + 1, lit(sub)),
            ce.getField("centv")) * 10000).cast("long"))))
      .select("query_id", "lut")
    val cand = adcTopCandidates(codes.crossJoin(broadcast(q)), k * refine)
    val vecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qvecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rankTopK(cand.join(vecs, "neighbor_id").join(broadcast(qvecs), "query_id"), k)
  }

  /** md5-hyperplane LSH bucket id as an nBits-char '0'/'1' string —
    * [[graft.functions.VectorFunctions.lshBucket]]'s verification
    * family: hyperplane (h, i)'s ±1 component is the parity of md5's
    * first hex nibble of "h|i", and the projection is rounded to 4dp
    * BEFORE the sign test, so bucket assignment is reproducible in
    * DuckDB (summation-order float dust below 5e-5 collapses in the
    * round). String buckets sidestep bit-shift sign traps, same as
    * [[Dedup.simhashSignaturesMd5]]. */
  def lshBucketMd5(vec: Column, nBits: Int): Column =
    concat((0 until nBits).map { h =>
      val p = round(aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * when(
            conv(substring(md5(concat(lit(h.toString), lit("|"), i.cast("string"))), 1, 1),
              16, 10).cast("int").bitwiseAND(lit(1)) === 1, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x), 4)
      when(p > 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** [[lshTopK]]'s verification twin (home bucket only — the multi-probe
    * flip ordering is the one piece not worth mirroring in SQL): both
    * sides bucket under [[lshBucketMd5]], candidates come from the same
    * bucket equi-join, ranking is the shared [[rankTopK]] contract. Every
    * stage is DuckDB-reproducible, so the hyperplane-LSH ANN family gets
    * a full hash oracle (q98; the production multi-probe q30 keeps its
    * rows-only check + q50 recall floor). */
  def lshTopKMd5(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, nBits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucketMd5(col(vecCol), nBits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucketMd5(col(vecCol), nBits).as("bucket"))
    rankTopK(c.join(q, "bucket"), k)
  }

  /** [[ivfTopK]]'s verification twin: identical plan shape (broadcast
    * centroid-pack assignment, expression probe list, cell equi-join,
    * [[rankTopK]] tail) but every ordering decision — cell argmax, probe
    * ranking, final top-k — runs on round(cosine, 4) with id tiebreaks,
    * and the centroid table is supplied by the caller
    * ([[md5SeededCentroids]] for q96), so the WHOLE approximate search
    * is reproducible bit-for-bit in DuckDB and gets a full hash oracle
    * (the production xxhash64-seeded q35 keeps its rows-only check +
    * recall floor). */
  /** Per-query probe cells under the rounded deterministic metric: one
    * row per (query, probed centroid), nProbe nearest cells each.
    * `carry` columns (renamed source → output) ride the projection —
    * shared by the filtered and unfiltered deterministic searches so
    * probe semantics can never diverge between them. */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame, nProbe: Int,
                         carry: Seq[(String, String)] = Nil): DataFrame = {
    val carried = carry.map { case (c, a) => col(c).as(a) }
    val carriedOut = carry.map { case (_, a) => col(a) }
    queries
      .select(col(idCol).as("query_id") +: col(vecCol).as("qv") +: carried: _*)
      .crossJoin(broadcast(packCentroids(centroids)))
      .select(col("query_id") +: col("qv") +: carriedOut :+
        explode(slice(array_sort(roundedCentroidScores(col("qv"))), 1, nProbe)).as("__p"): _*)
      .select(col("query_id") +: col("qv") +: carriedOut :+
        col("__p").getField("centroid_id").as("centroid_id"): _*)
  }

  def ivfTopKDeterministic(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           centroids: DataFrame, nProbe: Int = 2): DataFrame = {
    val assigned = assignCellsRounded(corpus, idCol, vecCol, centroids)
    val probes = probeCells(queries, idCol, vecCol, centroids, nProbe)
    rankTopK(assigned.join(probes, "centroid_id"), k)
  }

  /** Filtered ANN: [[ivfTopKDeterministic]] under a per-query metadata
    * constraint — each query retrieves its top-k only among corpus rows
    * whose `metaCol` equals the query's own ("search within my
    * category": the tenant/language/label scoping every production
    * vector store exposes as a search-time filter). The predicate is
    * POST-FILTER-then-rank (candidates failing the filter are discarded
    * BEFORE any ranking slot is spent, so the k results are all valid —
    * the FAISS IDSelector / Qdrant-filter semantics), applied at the
    * cell-candidate join where the metadata rides the index row itself
    * ([[assignCellsRounded]]'s carry) — no corpus-sized join-back, no
    * distance math on filtered-out rows.
    *
    * Recall caveat (documented, inherent to IVF filtering): probes are
    * chosen by unfiltered cell proximity, so a heavily-filtered query
    * may see fewer than k candidates in its probed cells; raise nProbe
    * when filters are selective. Determinism: identical to
    * [[ivfTopKDeterministic]] (shared [[probeCells]]/[[rankTopK]] —
    * rounded metrics, id tiebreaks), plus the `+ 0.0` signed-zero
    * collapse on the emitted sim: thinned candidate sets can rank a
    * near-orthogonal pair, whose ±1e-18 sim rounds to -0.0 or 0.0 by
    * engine summation order (the q54/q88 lesson — q103's oracle
    * collapses identically).
    *
    * Output: (query_id, metaCol, neighbor_id, sim, rk). */
  def ivfTopKDeterministicFiltered(corpus: DataFrame, queries: DataFrame,
                                   idCol: String, vecCol: String,
                                   metaCol: String, k: Int,
                                   centroids: DataFrame,
                                   nProbe: Int = 2): DataFrame = {
    val assigned = assignCellsRounded(corpus, idCol, vecCol, centroids,
      carry = Seq(metaCol))
    val probes = probeCells(queries, idCol, vecCol, centroids, nProbe,
      carry = Seq(metaCol -> "__qm"))
    rankTopK(
      assigned.join(probes, "centroid_id").filter(col(metaCol) === col("__qm")),
      k, carryOut = Seq(metaCol))
  }

  /** Hard-negative mining — [[ivfTopKDeterministicFiltered]] with the
    * predicate INVERTED: each query's top-k nearest neighbors among
    * vectors with a DIFFERENT `metaCol` label. This is the contrastive-
    * training data constructor (per-anchor hardest negatives: closest
    * in embedding space, wrong by label — e.g. SimCSE/DPR-style triplet
    * mining, or "nearest doc from another source" curation audits).
    * Same plan economics as the filtered search: the label rides the
    * zero-Exchange cell assignment, candidates come only from probed
    * cells, the ≠ filter runs before any distance math on excluded
    * rows, and no corpus join-back exists. Self cannot match (same id ⇒
    * same label), but the explicit id guard is kept for robustness
    * against inconsistent labels.
    *
    * The different-label filter is SELECTIVE in the opposite way from
    * the same-label one: most of a probed cell usually survives, so
    * nProbe can stay small; recall loss happens only when a query's
    * hardest negatives live outside its probed cells — the standard
    * IVF trade, measured by the q50 harness family. */
  def ivfHardNegativesDeterministic(corpus: DataFrame, queries: DataFrame,
                                    idCol: String, vecCol: String,
                                    metaCol: String, k: Int,
                                    centroids: DataFrame,
                                    nProbe: Int = 2): DataFrame = {
    val assigned = assignCellsRounded(corpus, idCol, vecCol, centroids,
      carry = Seq(metaCol))
    val probes = probeCells(queries, idCol, vecCol, centroids, nProbe,
      carry = Seq(metaCol -> "__qm"))
    rankTopK(
      assigned.join(probes, "centroid_id").filter(col(metaCol) =!= col("__qm")),
      k, carryOut = Seq(metaCol))
  }

  /** Cluster LABELING — top-`k` c-TF-IDF terms per embedding cell
    * (BERTopic's class-based TF-IDF, Grootendorst 2022): what a
    * semantic-curation pass reads to understand WHAT each k-means /
    * IVF cell of the corpus actually contains before deciding to
    * sample, cap, or drop it. Documents join their embeddings by id,
    * ride the zero-Exchange rounded cell assignment, and each cell is
    * treated as one pseudo-document: score(t, c) = tf(t, c) ·
    * idf_q(t), idf_q = round(ln((C + 1)/(cf + 1)) · 10⁴) with C = #cells
    * and cf = #cells containing t — so the score is an INTEGER product
    * (exact cross-engine, no summation-order concerns at all), and the
    * per-cell cut is one by-cell window over the vocabulary-bounded
    * (cell, term) table.
    *
    * Shape: the corpus-grain stages are the id equi-join and the
    * (cell, term) count's map-side-combined Exchange; everything after
    * runs at vocabulary grain. Centroids broadcast; C is a one-row
    * broadcast; no global window. */
  def clusterTopTermsDeterministic(docs: DataFrame, embeddings: DataFrame,
                                   docIdCol: String, textCol: String,
                                   embIdCol: String, vecCol: String,
                                   centroids: DataFrame, k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val assigned = assignCellsRounded(embeddings, embIdCol, vecCol, centroids)
      .select(col("neighbor_id").as(docIdCol), col("centroid_id"))
    val terms = docs
      .select(col(docIdCol), graft.functions.TextFunctions.tokens(col(textCol)).as("__w"))
      .join(assigned, docIdCol)
      .select(col("centroid_id"), explode(col("__w")).as("term"))
      .groupBy("centroid_id", "term").agg(count(lit(1)).as("tf"))
    val nCells = assigned.agg(countDistinct(col("centroid_id")).as("__nc"))
    val idf = terms.groupBy("term")
      .agg(countDistinct(col("centroid_id")).as("__cf"))
      .crossJoin(broadcast(nCells))
      .select(col("term"),
        round(log((col("__nc") + 1.0) / (col("__cf") + 1.0)) * 10000)
          .cast("long").as("__idfq"))
    val w = Window.partitionBy("centroid_id")
      .orderBy(col("__score").desc, col("term"))
    terms.join(idf, "term")
      .withColumn("__score", col("tf") * col("__idfq"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("centroid_id"), col("rk"), col("term"), col("tf"),
        graft.functions.Num.round4(col("__score") / 10000.0).as("ctfidf"))
  }

  /** IVF index health audit (q144): per-cell occupancy of the
    * deterministic cell assignment plus the two readings an index
    * operator actually watches — `share_bp` (basis points of the corpus
    * in this cell) and `load_q` (×10⁴ load factor vs perfect balance;
    * 10⁴ = ideal, the max over cells IS the worst-case probe-cost
    * multiplier, since IVF probe latency is proportional to probed-cell
    * size). Both are positive-operand integer floor divisions of exact
    * counts — nothing to drift cross-engine.
    *
    * Scale: the corpus-sized work is the zero-Exchange broadcast-pack
    * assignment projecting straight into a #cells-grain count (map-side
    * partials; vectors never shuffle); everything after runs on the
    * #cells-row occupancy table with a one-row broadcast total. */
  def indexBalanceAudit(corpus: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame): DataFrame = {
    val occ = assignCellsRounded(corpus, idCol, vecCol, centroids)
      .groupBy(col("centroid_id").as("cell")).agg(count(lit(1)).as("n_vecs"))
    val tot = occ.agg(sum("n_vecs").as("__t"), count(lit(1)).as("__k"))
    occ.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        expr("(n_vecs * 10000) div __t").as("share_bp"),
        expr("(n_vecs * __k * 10000) div __t").as("load_q"))
  }

  /** Cluster-separation audit — the GEOMETRIC quality read behind
    * [[indexBalanceAudit]]'s occupancy one: per cell, how tight are
    * its members relative to how far the next-best centroid is?
    * tightness_bp = Σ intra-dist² · 10⁴ DIV Σ nearest-other-dist² —
    * low = compact well-separated cells (ANN probes and k-means labels
    * you can trust), → 10⁴ = members sit as close to a neighboring
    * centroid as their own (cell boundaries are noise, recall will
    * suffer at nProbe=1). A Davies–Bouldin-shaped reading kept EXACT:
    * coordinates quantize to ×10⁴ BIGINTs (the pc1 discipline) so
    * every distance² is an exact integer and both engines agree to the
    * bit; the final ratio is one sign-free integer division (NULL when
    * the nearest-other sum is zero — all points at all centroids).
    *
    * Shape: one broadcast cross join against the ≤nCentroids centroid
    * table (vectors never shuffle), a per-point sorted-struct pick of
    * (own, second) distances, and a cell-grain aggregate. Output:
    * (cell, n_points, sum_intra, sum_nearest_other, tightness_bp). */
  def clusterSeparation(corpus: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame): DataFrame = {
    val quant: Column => Column =
      v => transform(v, x => round(x.cast("double") * 10000).cast("long"))
    val e = corpus.select(col(idCol).as("__id"), quant(col(vecCol)).as("__q"))
    val cent = centroids.select(col("centroid_id").as("__cid"),
      quant(col("centv")).as("__cq"))
    val d = e.crossJoin(broadcast(cent))
      .select(col("__id"), col("__cid"),
        expr("""aggregate(zip_with(__q, __cq, (x, y) -> (x - y) * (x - y)),
          0L, (a, x) -> a + x)""").as("__d2"))
    val picked = d.groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__d2"), col("__cid"))))
        .as("__ds"))
      .select(
        col("__ds")(0).getField("__cid").as("cell"),
        col("__ds")(0).getField("__d2").as("__intra"),
        col("__ds")(1).getField("__d2").as("__other"))
    picked.groupBy("cell")
      .agg(count(lit(1)).as("n_points"),
        sum("__intra").as("sum_intra"),
        sum("__other").as("sum_nearest_other"))
      .withColumn("tightness_bp", expr(
        """CASE WHEN sum_nearest_other = 0 THEN NULL
          ELSE CAST((CAST(sum_intra AS DECIMAL(38,0)) * 10000)
            DIV CAST(sum_nearest_other AS DECIMAL(38,0)) AS BIGINT) END"""))
  }
}
