package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear text-classifier inference — the model-based quality gate of
  * the CCNet / LLaMA-pipeline family (Wenzek et al. 2020; Touvron et
  * al. 2023 both gate web text on a fastText linear classifier): a
  * document's score is the sum of its tokens' learned weights and the
  * gate keeps documents the classifier scores positive (for a linear
  * model, logit > 0 ⟺ p > 0.5). This complements the HEURISTIC
  * quality family (q24 ratios, q79 calibrated percentile): those
  * encode hand rules, this is the deployment shape for a TRAINED
  * model.
  *
  * The weight table here is a deterministic stand-in — ×10⁻³-quantized
  * integer weights derived from a public md5 of the token — because
  * training is out of scope; the PIPELINE is the deliverable, and
  * swapping the stand-in for real trained weights is a one-table
  * replacement with identical shape (token → integer weight). Scoring
  * is exact BIGINT summation, so inference hash-checks cross-engine.
  *
  * Scale: the vocabulary is LIMIT-bounded (top `vocabSize` by corpus
  * frequency — the vocab cut a real fastText model ships with), so
  * Catalyst broadcasts it onto the (doc, token) stream: per-token
  * lookup with NO shuffle for the join, map-side partials into the one
  * per-document aggregate. OOV tokens score 0 via the left join,
  * exactly like an OOV bucket at serve time. Empty documents produce
  * no tokens and are absent — the gate's input contract, not a drop
  * decision. */
object LinearModel {

  /** Score + gate every document: (id, n_tokens, n_in_vocab, score_q3,
    * keep). `score_q3` is the ×10⁻³ logit as an exact BIGINT;
    * `keep` = 1 iff score_q3 > 0. */
  def linearGate(idCol: String, textCol: String, vocabSize: Int = 2000)
                (docs: DataFrame): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    val toks = Staged.stage(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("__t")))
    val vocab = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__t")).limit(vocabSize)
      .select(col("__t"),
        (pmod(conv(substring(md5(concat(lit("w|"), col("__t"))), 1, 12),
          16, 10).cast("long"), lit(2001L)) - 1000L).as("__w"))
    toks.join(vocab, Seq("__t"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__w")).as("n_in_vocab"),
        coalesce(sum(col("__w")), lit(0L)).as("score_q3"))
      .withColumn("keep", when(col("score_q3") > 0, 1L).otherwise(0L))
  }
}
