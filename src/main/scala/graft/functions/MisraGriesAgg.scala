package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012) as a
  * typed Spark `Aggregator` — the TOP-K member of the bounded-state
  * sketch quartet (KMV = distinct count, CMS = point frequency,
  * histogram = quantiles, this = heavy hitters): ≤ k counters per
  * group forever, whatever the vocabulary does, where the exact q77
  * heavy-hitters query keeps a counter per distinct item.
  *
  * Guarantees (the laws `MisraGriesAggSpec` pins under arbitrary
  * partitionings): for every item x with true count t(x) over n rows,
  *   t(x) − n/k  ≤  est(x)  ≤  t(x)     (est = 0 if absent), so
  * every TRUE heavy hitter (t > n/k) is guaranteed PRESENT in the
  * summary. The summary's exact counter values — unlike every
  * guarantee above — depend on encounter order, which is why the q152
  * surface is rows-only + law-specs rather than a hash oracle (same
  * status as the xxhash production sketches); when a group has ≤ k
  * distinct items the summary degenerates to exact counts and IS
  * deterministic.
  *
  * reduce: hit → increment; miss with room → insert at 1; miss with k
  * counters → decrement ALL by one and drop zeros (charging the miss
  * against every survivor — the classic argument bounding total
  * undercount by n/k). merge: pointwise sum, then subtract the
  * (k+1)-th largest count from everything and keep the positives —
  * the PODS-2012 merge that preserves the error bound, which is what
  * makes the sketch safe for map-side partial aggregation.
  */
class MisraGriesAgg[I](k: Int, extract: I => String)
    extends Aggregator[I, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(k >= 1, s"MisraGries needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], row: I): Map[String, Long] = {
    val key = extract(row)
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1)
      case None if b.size < k => b.updated(key, 1L)
      case None =>
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }
  }

  override def merge(b1: Map[String, Long], b2: Map[String, Long])
      : Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count; ≤ k survive by definition
      val cut = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGriesAgg {
  def apply[I](k: Int, extract: I => String): MisraGriesAgg[I] =
    new MisraGriesAgg[I](k, extract)
}
