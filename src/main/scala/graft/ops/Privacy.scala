package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits for a training corpus: re-identification risk of
  * quasi-identifier combinations. [[graft.functions.TextFunctions]]'
  * PII redaction (q78) removes direct identifiers from text; this
  * measures what the METADATA still leaks — the release-review number
  * for a corpus shipped with per-document attributes.
  */
object Privacy {

  /** k-anonymity / l-diversity audit over the quasi-identifier columns
    * `qiCols`: every row falls into the equivalence class of its QI
    * value combination, and a class smaller than `k` means its members
    * are re-identifiable to within `class_size` candidates by anyone
    * who knows those attributes (Sweeney's k-anonymity); a class whose
    * `sensitiveCol` takes fewer than `l` distinct values leaks the
    * sensitive attribute even when large enough (Machanavajjhala's
    * l-diversity — the homogeneity attack). Emits one row per class —
    * (qi…, class_size, n_sensitive, k_ok, l_ok) — plus the global
    * audit columns (total_rows, at_risk_rows, risk_bp) broadcast onto
    * every row, all in exact integer arithmetic.
    *
    * Shape: one (qi, sensitive)-grain aggregate with map-side partials
    * (the only corpus-grain stage — the distinct-sensitive count rides
    * the same Expand as the class count, the q34 pattern), then the
    * totals aggregate and broadcast-back over the QI-DOMAIN-sized
    * class table. Nothing re-touches the corpus. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 k: Int, l: Int = 2): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    require(l >= 1, s"l must be >= 1: $l")
    val classes = Staged.stage(df
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive")))
    val totals = classes.agg(
      sum("class_size").as("total_rows"),
      coalesce(sum(when(col("class_size") < k, col("class_size"))), lit(0L))
        .as("at_risk_rows"))
    classes
      .withColumn("k_ok", when(col("class_size") >= k, 1L).otherwise(0L))
      .withColumn("l_ok", when(col("n_sensitive") >= l, 1L).otherwise(0L))
      .crossJoin(broadcast(totals))
      .withColumn("risk_bp", expr("at_risk_rows * 10000 DIV total_rows"))
  }
}
