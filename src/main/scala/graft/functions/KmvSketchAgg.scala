package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * the unbiased (k−1)/h₍k₎ estimator of Beyer et al., SIGMOD 2007) as a
  * typed, mergeable Spark `Aggregator`.
  *
  * Buffer = the k smallest DISTINCT hash values seen so far, sorted
  * ascending — O(k) state that absorbs duplicates map-side and merges
  * associatively and commutatively, so the result is a pure function of
  * the input SET: independent of row order, duplication, partitioning,
  * and partial-aggregation boundaries (the property that lets a DuckDB
  * oracle reproduce the estimate bit-for-bit, q121).
  *
  * Unlike `approx_count_distinct`'s HLL — whose sketch internals are
  * engine-private and hence only rows-checkable (q49) — the KMV state is
  * just "bottom k of a public md5-derived hash": any engine computes the
  * identical sketch, which is what makes this the hash-verifiable member
  * of the sketch family.
  *
  * Scale: map-side partial aggregation keeps per-group state at ≤ k
  * longs; the shuffle carries one bounded array per (group × map task) —
  * never the values themselves. With a 48-bit hash the estimate
  * `(k−1)·2⁴⁸ / h₍k₎` is one division of exactly-representable doubles.
  *
  * @param extract the (already-hashed) value from an input row; hash
  *                quality is the caller's contract — md5-derived 48-bit
  *                prefixes in q121 so both engines agree
  */
class KmvSketchAgg[I](k: Int, extract: I => Long)
    extends Aggregator[I, Array[Long], Array[Long]] with Serializable {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], row: I): Array[Long] = {
    val h = extract(row)
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already in the bottom-k set
    else {
      val ins = -pos - 1
      if (ins >= k) b // not smaller than the current k-th minimum
      else {
        val out = new Array[Long](math.min(b.length + 1, k))
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // sorted-distinct two-pointer merge, capped at k
    val tmp = new Array[Long](math.min(b1.length + b2.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < tmp.length && (i < b1.length || j < b2.length)) {
      val take =
        if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) {
          val v = b1(i); i += 1
          if (j < b2.length && b2(j) == v) j += 1 // drop the duplicate
          v
        } else { val v = b2(j); j += 1; v }
      tmp(o) = take; o += 1
    }
    if (o == tmp.length) tmp else java.util.Arrays.copyOf(tmp, o)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object KmvSketchAgg {
  def apply[I](k: Int, extract: I => Long): KmvSketchAgg[I] =
    new KmvSketchAgg[I](k, extract)

  /** The Beyer et al. estimate from a finished sketch, driver-side (the
    * SQL twin lives inline in q121): exact when the sketch saw fewer
    * than k distinct hashes, else (k−1)·2^bits / h₍k₎. */
  def estimate(sketch: Array[Long], k: Int, hashBits: Int = 48): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble * math.pow(2.0, hashBits) / sketch(k - 1).toDouble
}
