package graft.ops

import graft.functions.VectorFunctions._
import graft.functions.CosineSimilarityExpr.cosineSim
import org.apache.spark.sql.DataFrame
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

  /** Exact top-k cosine neighbors for each row of `queries` (small,
    * broadcast) against `corpus`. Excludes self-matches on id equality. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosineSim(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }

  /** LSH-bucketed approximate top-k: only candidates sharing a
    * `nBits`-bit hyperplane signature bucket are scored. With B buckets
    * the scored-pair count is ~Q·N/B; recall is tuned by lowering nBits
    * or probing multiple buckets (multi-probe left for the IVF variant).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val scored = c.join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosineSim(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path. Coarse quantizer: every `corpusSize/nCentroids`-th vector in
    * id order (deterministic, no trained model, no driver collect);
    * corpus rows are assigned to their nearest centroid (one broadcast
    * join), queries probe their `nProbe` nearest centroids, and scoring
    * is an equi-join on the centroid id.
    *
    * Scored pairs drop from Q·N to ~Q·nProbe·N/nCentroids. Compared to
    * [[lshTopK]]: IVF adapts to the data distribution (cells follow
    * density) at the cost of the assignment pass; LSH is data-oblivious.
    * A Lloyd refinement of the centroids is one extra
    * assign+groupBy-mean round if cell balance ever matters.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16,
              nProbe: Int = 2): DataFrame = {
    val ids = Window.orderBy(col("neighbor_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val n = c.count()
    val step = math.max(1L, n / nCentroids)
    // deterministic coarse quantizer: every step-th vector (single-
    // partition window is fine: it runs over ids only, once, and its
    // output is nCentroids rows)
    val centroids = c.withColumn("__rn", row_number().over(ids))
      .filter(((col("__rn") - 1) % step === 0) && col("__rn") <= step * nCentroids)
      .select(col("__rn").as("centroid_id"), col("cv").as("centv"))
    val assignW = Window.partitionBy("neighbor_id")
      .orderBy(col("__cs").desc, col("centroid_id"))
    val assigned = c.crossJoin(broadcast(centroids))
      .withColumn("__cs", cosineSim(col("cv"), col("centv")))
      .withColumn("__rk", row_number().over(assignW))
      .filter(col("__rk") === 1)
      .select("neighbor_id", "cv", "centroid_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__cs").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__cs", cosineSim(col("qv"), col("centv")))
      .withColumn("__rk", row_number().over(probeW))
      .filter(col("__rk") <= nProbe)
      .select("query_id", "qv", "centroid_id")
    val scored = assigned.join(probes, "centroid_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosineSim(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }

  /** Embedding-cosine near-duplicate pairs over the whole corpus via LSH
    * buckets: pairs in the same bucket with cosine >= threshold. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nBits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", round(cosineSim(col("a.v"), col("b.v")), 4))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}
