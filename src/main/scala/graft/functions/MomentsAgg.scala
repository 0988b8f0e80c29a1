package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Integer second-moment statistics of ×10⁴-quantized vectors as ONE
  * typed, mergeable Spark `Aggregator` — the distributed pass of the
  * deterministic PCA operator ([[graft.ops.Spectral]], q139/q140).
  *
  * Buffer layout (row-major, d²+d+1 longs):
  *   - `[0, d²)`   — M = Σᵣ xᵣ·xᵣᵀ, the raw outer-product sums;
  *   - `[d², d²+d)` — S = Σᵣ xᵣ, the per-dimension sums;
  *   - `[d²+d]`     — n, the row count.
  * All three merge by plain BIGINT addition: associative, commutative,
  * order-independent — map-side partial aggregation reduces every
  * partition to one ~33 KB (d=64) state row and the shuffle carries
  * `#partitions` states, never the vectors. The CENTERED scatter matrix
  * is then exact integer algebra on the driver,
  * A = M − μ·Sᵀ − S·μᵀ + n·μ·μᵀ for the integer-rounded mean μ, so
  * centering costs no second corpus pass. Same "state is plain
  * relational data" contract as [[KmvSketchAgg]] / the q130 histogram:
  * any engine summing the identical integer products reproduces the
  * bit-identical matrix — what lets the DuckDB oracle replay the
  * downstream power iteration exactly.
  *
  * Overflow bound: with |x| ≲ 2·10⁴ (×10⁴-quantized unit-scale
  * embeddings), a cell of M stays inside Long for n ≲ 2·10¹⁰ rows.
  * Past that, subsample — a second-moment estimate from 10¹⁰ rows is
  * statistically indistinguishable from the full corpus's; the
  * contract documents that knob rather than silently widening to
  * slower 128-bit state.
  */
class MomentsAgg(d: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] with Serializable {
  require(d > 0, s"dimension must be positive: $d")

  override def zero: Array[Long] = new Array[Long](d * d + d + 1)

  override def reduce(b: Array[Long], x: Array[Long]): Array[Long] = {
    require(x.length == d, s"vector length ${x.length} != d=$d")
    var j = 0
    while (j < d) {
      val xj = x(j); val row = j * d
      var k = 0
      while (k < d) { b(row + k) += xj * x(k); k += 1 }
      b(d * d + j) += xj
      j += 1
    }
    b(d * d + d) += 1L
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
