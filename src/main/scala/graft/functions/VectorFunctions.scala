package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (north star:
  * similarity search / embedding near-dup). Built from zip_with/aggregate
  * higher-order expressions — no UDFs, fully distributed, null-safe only
  * as far as the inputs are (embeddings are non-null in the test tables).
  *
  * Scale note: each op is O(dim) per row and runs inside the expression
  * pipeline; the expensive part of kNN is the pair enumeration, which the
  * callers in [[graft.ops.Similarity]] control (brute-force vs LSH/IVF).
  */
object VectorFunctions {

  /** Dot product of two equal-length numeric arrays → double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null for zero vectors (ANSI-safe: a plain
    * division would throw DIVIDE_BY_ZERO under Spark 4's default ANSI
    * mode). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0.0, dot(a, b) / denom)
  }

  /** L2 distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x))

  /** Deterministic LSH bucket id from `nBits` random-hyperplane signs.
    * Hyperplane h's component for dimension i is a pseudo-random ±1 derived
    * from xxhash64(h, i) — reproducible across runs with no stored model.
    * sim(sign-agreement) approximates cosine; used to prune the kNN
    * candidate space from O(N²) to O(N·bucket).
    */
  def lshBucket(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { h =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            when(shiftright(xxhash64(lit(h), i), 13).bitwiseAND(lit(1L)) === 1L, 1.0)
              .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << h)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
