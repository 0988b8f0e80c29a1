package graft.ops

import graft.functions.Num
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the BM25 ranking function
  * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
  * BM25 and Beyond") as a Spark plan. A training-data build uses this
  * constantly: "pull the documents about X" for curation audits, topic
  * filters, and retrieval-augmented eval-set construction, where the
  * embedding ANN family ([[Similarity]]) needs a vector and this needs
  * only words.
  *
  * Plan shape (the inverted-index discipline): the corpus is tokenized
  * once; only tokens matching the query terms survive the map side, so
  * the (doc, term) Exchange carries query-term postings — the inverted
  * index restricted to the query — never the corpus vocabulary. The
  * per-term df/idf table is #terms rows and broadcasts back onto the
  * postings; the corpus-wide (N, avgdl) pair is one row and rides a
  * broadcast crossJoin. Nothing in the plan scales with vocabulary
  * size, and the final cut is a TakeOrderedAndProject, not a global
  * sort.
  *
  * Cross-engine determinism (the q99/q102 quantization discipline):
  * idf = ln((N − df + 0.5)/(df + 0.5) + 1) is quantized to a ×10⁴
  * BIGINT (ln differs by ulps across engines); the per-term partial
  * score idf_q · tf·(k1+1)/(tf + k1·(1−b) + k1·b·dl/avgdl) is rounded
  * to a BIGINT before the per-doc sum, so the sum is order-free integer
  * arithmetic and one final division emits the double. avgdl is an
  * integer-sum / integer-count division — bit-identical cross-engine.
  */
object Retrieval {

  /** Top-`k` documents for a bag-of-words query under BM25.
    * Output: (id, matched = #query terms present, score = 4dp BM25). */
  def bm25TopK(idCol: String, textCol: String, terms: Seq[String],
               k: Int = 20, k1: Double = 1.2, b: Double = 0.75)
              (docs: DataFrame): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, s"k must be positive: $k")
    // staged: both the corpus-stats aggregate and the postings explode
    // consume the tokenization — unstaged, the corpus tokenizes twice
    val toked = Staged.stage(docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) > 0)
      .withColumn("__dl", size(col("__w")).cast("long")))
    // one row: corpus size + total tokens (exact integer sums → avgdl
    // is the same double in any engine)
    val corpus = toked.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__t"))
    // query-term postings: the filter rides the explode map-side, so
    // the Exchange is the query's inverted-index slice
    val tf = toked
      .select(col(idCol), col("__dl"), explode(col("__w")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val idf = tf.groupBy("__term")
      .agg(countDistinct(col(idCol)).as("__df"))
      .crossJoin(broadcast(corpus))
      .select(col("__term"),
        round(log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
          * 10000).cast("long").as("__idfq"),
        (col("__t").cast("double") / col("__n")).as("__avgdl"))
    tf.join(broadcast(idf), Seq("__term"))
      .select(col(idCol),
        col("__term"),
        // per-term partial quantized to an integer BEFORE the per-doc
        // sum — addition order cannot move the result
        round(col("__idfq") *
          ((col("__tf") * (k1 + 1.0)) /
            (col("__tf") + lit(k1 * (1.0 - b)) +
              lit(k1 * b) * col("__dl") / col("__avgdl"))))
          .cast("long").as("__sq"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("matched"), sum(col("__sq")).as("__s"))
      .select(col(idCol), col("matched"),
        Num.round4(col("__s") / 10000.0).as("score"), col("__s"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(k)
      .drop("__s")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    * of ranked candidate lists — THE standard hybrid-retrieval
    * combiner: keyword (BM25) + vector (ANN) lists, or relevance +
    * authority (PageRank), fuse by rank alone so wildly different score
    * scales need no calibration. Each list contributes
    * `num div (rrfK + rank)` — the RRF 1/(k+r) term as a positive-
    * operand integer floor division (×10⁸ scale), so the fused score is
    * an exact BIGINT sum any engine reproduces; cuts and ties resolve
    * on (score desc, id).
    *
    * Contract: every input list carries `idCol` and a 1-based `rank`
    * column (long). Lists are k-row CANDIDATE SETS, not corpora — the
    * union/aggregate below runs on #lists·k rows however large the
    * corpus that produced them, and the final cut is a
    * TakeOrderedAndProject. Output: (id, n_lists, rrf_q). */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int,
              rrfK: Int = 60, num: Long = 100000000L): DataFrame = {
    require(lists.size >= 2, s"fusion needs >= 2 lists, got ${lists.size}")
    require(k > 0 && rrfK >= 0 && num > 0, s"bad parameters k=$k rrfK=$rrfK num=$num")
    lists.map(_.select(col(idCol),
        expr(s"${num}L div (${rrfK}L + rank)").as("__c")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"), sum(col("__c")).as("rrf_q"))
      .orderBy(col("rrf_q").desc, col(idCol))
      .limit(k)
  }

  /** Maximal Marginal Relevance re-ranking: greedily pick k results
    * balancing relevance to the query against redundancy with what is
    * already picked — score = relWeight·rel − divWeight·max cosine to
    * the selected set; the first pick is pure argmax relevance. The
    * standard diversified-retrieval head on top of any dense ranker
    * (RAG context assembly, search-result dedup), and the
    * query-anchored sibling of [[graft.ops.Coreset.kCenterGreedy]].
    *
    * `relWeight`/`divWeight` are BOTH explicit: computing 1−λ in
    * different places yields different doubles (1−0.7 ≠ the 0.3
    * literal), and the verify contract needs the engine and the oracle
    * to fold the exact same constants.
    *
    * Scale shape: relevance and norms are ONE staged projection; each
    * of the k ≤ 64 driver rounds is one scan + TakeOrdered(1) with the
    * selected vectors as literals in the codegen score expression (the
    * q157 pattern). At serve scale candidates come pre-cut by ANN
    * (q30/q35), so the scan is top-N-sized, not corpus-sized. */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int,
                relWeight: Double = 0.7, divWeight: Double = 0.3): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions.dot
    val n0 = emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
    val q = n0.filter(col("id") === queryId)
      .select("v", "n2").collect()
    require(q.nonEmpty, s"query id $queryId not found")
    val (qv, qn2) = (q(0).getSeq[Double](0).toArray, q(0).getDouble(1))
    val base = Staged.stage(n0.filter(col("id") =!= queryId)
      .withColumn("rel", dot(col("v"), array(qv.map(lit).toSeq: _*)) /
        (sqrt(col("n2")) * sqrt(lit(qn2)))))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val centers = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    var picked = Vector.empty[Long]
    var r = 1
    while (r <= k) {
      val scored =
        if (centers.isEmpty) base.withColumn("__sc", col("rel"))
        else {
          val sims = centers.map { case (cv, cn2) =>
            dot(col("v"), array(cv.map(lit).toSeq: _*)) /
              (sqrt(col("n2")) * sqrt(lit(cn2)))
          }.toSeq
          val ms = if (sims.size == 1) sims.head else greatest(sims: _*)
          base.withColumn("__sc",
            lit(relWeight) * col("rel") - lit(divWeight) * ms)
        }
      val row = scored.filter(if (picked.isEmpty) lit(true)
          else !col("id").isin(picked: _*))
        .orderBy(desc("__sc"), asc("id")).limit(1)
        .select("id", "v", "__sc", "n2").collect()(0)
      picks += ((r.toLong, row.getLong(0), row.getDouble(2)))
      centers += ((row.getSeq[Double](1).toArray, row.getDouble(3)))
      picked :+= row.getLong(0)
      r += 1
    }
    picks.toSeq.toDF("round", "vec_id", "score")
      .select(col("round"), col("vec_id"),
        graft.functions.Num.round4(col("score")).as("score_q4"))
  }
}
