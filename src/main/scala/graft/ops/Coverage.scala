package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage data selection: pick the k documents that
  * together cover the most of a bounded target vocabulary, one
  * highest-marginal-gain document per round — the classic (1−1/e)
  * greedy for submodular coverage, and the standard recipe for carving
  * a small "show me the corpus" subset (eval seeds, prompt libraries,
  * annotation batches) whose union of vocabulary is maximal, where
  * q157's k-center maximizes spread in embedding space this maximizes
  * coverage in token space.
  *
  * Scale shape: the (doc, token) pair table is built once, restricted
  * to the LIMIT-bounded top-`vocabLimit` universe (the q149 vocab
  * pattern — the broadcast side is bounded however large the corpus),
  * and STAGED; each of the k ≤ 64 driver rounds is one anti-join of
  * that cache against the ≤ vocabLimit covered set (broadcast), one
  * map-side-partial count, and a TakeOrdered(1) reduction. Driver
  * state is ≤ vocabLimit token strings + k ids — bounded, documented.
  * No pair join between documents at any point.
  */
object Coverage {

  /** Returns (round BIGINT 1-based, doc_id, gain BIGINT = newly
    * covered units, covered_total BIGINT = |covered| after the
    * round). `unitsCol` is any array<string> expression over the doc
    * row — unigrams, shingles, code identifiers; richer units mean a
    * bigger universe and a more selective cover. Ties break to the
    * smallest doc id; a document with zero remaining gain drops out of
    * the candidate aggregate, and rounds end early if no candidate
    * remains. */
  def greedySetCover(docs: DataFrame, idCol: String,
                     unitsCol: org.apache.spark.sql.Column,
                     k: Int, vocabLimit: Int = 2000): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    require(vocabLimit >= 1, s"vocabLimit must be positive, got $vocabLimit")
    val spark = docs.sparkSession
    import spark.implicits._
    val tk = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(unitsCol).as("tok")).distinct()
    val universe = tk.groupBy("tok").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), asc("tok")).limit(vocabLimit).select("tok")
    val tku = Staged.stage(tk.join(broadcast(universe), "tok")
      .select("doc_id", "tok"))
    var covered = Set.empty[String]
    var picked = Vector.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val coveredDf = covered.toSeq.toDF("tok")
      val gains = tku
        .filter(if (picked.isEmpty) lit(true)
          else !col("doc_id").isin(picked: _*))
        .join(broadcast(coveredDf), Seq("tok"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("gain"))
      val top = gains.orderBy(desc("gain"), asc("doc_id")).limit(1)
        .as[(Long, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val (id, gain) = top(0)
        val newToks = tku.filter(col("doc_id") === id)
          .join(broadcast(coveredDf), Seq("tok"), "left_anti")
          .select("tok").as[String].collect() // ≤ vocabLimit total across all rounds
        covered ++= newToks
        picked :+= id
        out += ((r.toLong, id, gain, covered.size.toLong))
        r += 1
      }
    }
    out.toSeq.toDF("round", "doc_id", "gain", "covered_total")
  }
}
