package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.11's declared extension point): a
  * weighted mean with an explicit (weighted-sum, weight) buffer — the
  * shape needed to re-aggregate the loom table's (count, minutes) metric
  * pairs, e.g. efficiency weighted by running minutes, where a plain
  * avg-of-avgs is wrong.
  *
  * Generic in the input row type via an extractor so it plugs into any
  * `Dataset[I].groupByKey(...).agg(...)`. Mergeable by construction
  * (partial buffers add), so Spark applies it map-side before the
  * shuffle like any built-in aggregate.
  *
  * @param extract (value, weight) from an input row
  */
class WeightedMeanAgg[I](extract: I => (Double, Double))
    extends Aggregator[I, (Double, Double), Double] with Serializable {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), row: I): (Double, Double) = {
    val (v, w) = extract(row)
    (b._1 + v * w, b._2 + w)
  }
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMeanAgg {
  def apply[I](extract: I => (Double, Double)): WeightedMeanAgg[I] =
    new WeightedMeanAgg[I](extract)
}
