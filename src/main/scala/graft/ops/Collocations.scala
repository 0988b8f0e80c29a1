package graft.ops

import graft.functions.Num
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining — pointwise mutual information over adjacent
  * token pairs (Church & Hanks 1990), the standard phrase detector a
  * tokenizer-training / vocab-curation pipeline runs before deciding
  * which multi-word units deserve merges (BPE sees "new york" only as
  * bytes; PMI sees the association). pmi(x,y) = ln(P(xy) / (P(x)P(y)))
  * with P from corpus counts.
  *
  * Determinism: the PMI ratio is computed in a pinned operand order on
  * doubles from exact integer counts, then ln-quantized to a ×10⁴
  * BIGINT (the q118/q126 discipline — ln differs by ulps across
  * engines); ordering is (pmi_q desc, w1, w2), so the top-k cut cannot
  * diverge on representation.
  *
  * Scale shape: bigram and unigram count tables are vocabulary-bounded
  * (vocab², vocab), far smaller than the corpus after the minCount
  * gate, which applies BEFORE any join; corpus totals ride a one-row
  * broadcast; the cut is TakeOrderedAndProject. The (doc, bigram)
  * explode is the only corpus-sized stage and aggregates map-side.
  */
object Collocations {

  /** Top-`k` adjacent-pair collocations by PMI among pairs seen at
    * least `minCount` times. Output: (w1, w2, n_pair, pmi 4dp). */
  def pmiTopK(textCol: String, k: Int = 50, minCount: Long = 5L)
             (docs: DataFrame): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val toked = Staged.stage(docs
      .select(tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) > 0))
    val totals = toked.agg(
      sum(size(col("__w"))).cast("double").as("__n1"),
      sum(size(col("__w")) - 1).cast("double").as("__n2"))
    val uni = toked
      .select(explode(col("__w")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    val pairs = toked
      .select(explode(transform(sequence(lit(0), size(col("__w")) - 2),
        i => struct(element_at(col("__w"), i + 1).as("w1"),
          element_at(col("__w"), i + 2).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    pairs
      .join(uni.withColumnRenamed("__t", "w1").withColumnRenamed("__c", "__cx"), "w1")
      .join(uni.withColumnRenamed("__t", "w2").withColumnRenamed("__c", "__cy"), "w2")
      .crossJoin(broadcast(totals))
      // pinned operand order, mirrored verbatim in the oracle
      .withColumn("__pmiq",
        round(log((col("n_pair") * col("__n1") * col("__n1")) /
          (col("__cx").cast("double") * col("__cy") * col("__n2"))) * 10000)
          .cast("long"))
      .orderBy(col("__pmiq").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n_pair"),
        Num.round4(col("__pmiq") / 10000.0).as("pmi"))
  }
}
