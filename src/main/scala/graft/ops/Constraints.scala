package graft.ops

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking: each rule declares an
  * aggregate metric over the table and a predicate on it; the whole
  * rule set evaluates in ONE aggregate pass (a single Aggregate node —
  * no per-rule scans, map-side partials throughout), then pivots to a
  * (rule, metric, pass) report. This is the contract-check a corpus
  * intake runs before anything downstream trusts the batch: schema
  * invariants (uniqueness, completeness, derived-column consistency),
  * domain membership, and distribution bands, failing loudly as a
  * report row rather than silently poisoning training data.
  *
  * Scale shape: the fact table is read once; distinct-count rules add
  * the usual Expand to the single Aggregate; the report explode runs
  * on the one aggregate row. A 100 TB table prices at one scan however
  * many rules are declared.
  */
object Constraints {

  /** One rule: a name, an aggregate metric expression over the input,
    * and a pass predicate applied to the RAW metric value (the
    * report's metric column is 4dp-rounded for hash stability; the
    * predicate sees the unrounded double). */
  final case class Rule(name: String, metric: Column, pass: Column => Column)

  /** Evaluate all rules in one aggregate pass. Output: one row per
    * rule — (rule STRING, metric DOUBLE 4dp, pass BIGINT 1/0), in
    * declaration order. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "constraint report needs at least one rule")
    val aggd = df.agg(
      rules.head.metric.cast("double").as("__m0"),
      rules.tail.zipWithIndex.map { case (r, i) =>
        r.metric.cast("double").as(s"__m${i + 1}")
      }: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"),
        Num.round4(col(s"__m$i")).as("metric"),
        when(r.pass(col(s"__m$i")), 1L).otherwise(0L).as("pass"))
    }
    aggd.select(explode(array(rows: _*)).as("__r")).select("__r.*")
  }
}
