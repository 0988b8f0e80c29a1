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

  /** Unit-normalize to a double array; zero vectors pass through as-is
    * (ANSI-safe: unguarded division would throw DIVIDE_BY_ZERO). */
  def unitNormalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Symmetric int8 quantization: scale by 127/max|x| and round (ties
    * away from zero — Spark round and DuckDB round agree), the standard
    * embedding-compression step before ANN index build. Zero vectors
    * quantize to zeros. Output is array<long> so the values survive any
    * engine's integer width unchanged. */
  def quantizeInt8(a: Column): Column = {
    val mx = array_max(transform(a, x => abs(x.cast("double"))))
    when(mx === 0.0, transform(a, _ => lit(0L)))
      .otherwise(transform(a, x => round(x.cast("double") * 127.0 / mx).cast("long")))
  }

  /** L2 distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x))

  /** Raw hyperplane projections for `nBits` random hyperplanes, as an
    * array<double>. Hyperplane h's component for dimension i is a
    * pseudo-random ±1 derived from xxhash64(131·seed + h, i) —
    * reproducible across runs with no stored model; distinct `seed`s give
    * independent hyperplane sets (131 > max nBits, so (seed, h) ranges
    * never collide). The magnitudes drive multi-probe bucket selection
    * ([[lshProbes]]): the smaller |projection(h)| is, the likelier bit h
    * is on the wrong side of its hyperplane. */
  def lshProjections(vec: Column, nBits: Int, seed: Int = 0): Column =
    array((0 until nBits).map { h =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            when(shiftright(xxhash64(lit(131 * seed + h), i), 13).bitwiseAND(lit(1L)) === 1L, 1.0)
              .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  /** Johnson–Lindenstrauss sign-matrix projection to `k` dimensions
    * (Achlioptas 2003: ±1 entries preserve pairwise distances like
    * Gaussian ones, within (1±ε) for k = O(ln n / ε²)) — the cheap
    * dimensionality reduction an embedding pipeline runs before
    * storing/indexing when 64 dims of float cost more than the recall
    * they buy. Deterministic with NO stored model: sign(j, i) is the
    * high bit of md5("j|i") (portable to any engine, the q121/q137
    * public-hash discipline), and each component is an exact INTEGER
    * sum of ×10⁴-quantized inputs (order-free) with one final
    * /10⁴/√k float chain — so the projection is bit-identical
    * cross-engine. Scale: a pure per-row projection — no shuffle, no
    * broadcast, nothing scales with corpus size. */
  def jlProject(vec: Column, k: Int): Column = {
    val scale = math.sqrt(k.toDouble)
    transform(jlProjectQ(vec, k), q => q.cast("double") / 10000.0 / scale)
  }

  /** [[jlProject]]'s exact INTEGER form: component j is the ×10⁴-
    * quantized signed sum itself, in units of 10⁻⁴·√k — no float
    * division, no rounding, so the value is the same BIGINT in any
    * engine (a 4dp re-round of the float form sits exactly on .5
    * boundaries whenever the sum isn't divisible by √k·10⁴ — this form
    * is what a hash-verifying oracle should compare). Linear maps
    * preserve distance ratios under any fixed scale, so ANN/dedup
    * consumers can use the integer form directly. */
  def jlProjectQ(vec: Column, k: Int): Column = {
    require(k > 0, s"k must be positive: $k")
    array((0 until k).map { j =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => round(x.cast("double") * 10000).cast("long") *
            when(substring(md5(concat(lit(s"$j|"), i.cast("string"))), 1, 1) >= "8",
              1L).otherwise(-1L)),
        lit(0L), (acc, x) => acc + x)
    }: _*)
  }

  private def bucketOf(projs: Column, nBits: Int): Column =
    aggregate(
      zip_with(projs, sequence(lit(0), lit(nBits - 1)),
        (p, h) => when(p > 0, call_function("shiftleft", lit(1L), h)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Deterministic LSH bucket id from `nBits` random-hyperplane signs
    * (sign-agreement probability approximates cosine; prunes the kNN
    * candidate space from O(N²) to O(N·bucket)). Bit h is set iff
    * projection h is positive; the bit sum equals the OR since bits are
    * distinct. */
  def lshBucket(vec: Column, nBits: Int, seed: Int = 0): Column =
    bucketOf(lshProjections(vec, nBits, seed), nBits)

  /** Multi-probe LSH (Lv et al., VLDB'07 shape): the home bucket plus the
    * `nProbe - 1` next-likeliest buckets. A bucket's likelihood is scored
    * by the total |projection| of the bits flipped to reach it — the
    * smaller a projection's magnitude, the closer the vector sits to that
    * hyperplane and the likelier the bit is a sign error. The probing
    * sequence enumerates single-bit flips plus two-bit flips over the 8
    * closest hyperplanes (1 + nBits + C(min(nBits,8),2) candidates),
    * ordered by score. Returns an array of `nProbe` distinct bucket ids;
    * callers explode it on the (small) query side only, so the corpus is
    * still bucketed once and never re-hashed. */
  def lshProbes(vec: Column, nBits: Int, nProbe: Int, seed: Int = 0): Column = {
    val m = math.min(nBits, 8)
    val maxProbes = 1 + nBits + m * (m - 1) / 2
    require(nProbe >= 1 && nProbe <= maxProbes,
      s"nProbe must be in [1, $maxProbes] for nBits=$nBits")
    // the sorted (|proj|, bit, sign) table is bound ONCE per row as a
    // lambda variable: reusing a named Column subtree inlines it at every
    // reference (Catalyst has no CSE for interpreted higher-order
    // lambdas), which made the tree ~nBits·m² copies of the projection
    // sort — slow to analyze, optimize, and evaluate
    val sortedTable = array_sort(zip_with(lshProjections(vec, nBits, seed),
      sequence(lit(0), lit(nBits - 1)),
      (p, h) => struct(abs(p).as("a"), h.as("h"), (p > 0).as("pos"))))
    val probes = transform(array(sortedTable), bc => {
      def scoreAt(i: Column): Column = element_at(bc, i + 1).getField("a")
      def maskAt(i: Column): Column =
        call_function("shiftleft", lit(1L), element_at(bc, i + 1).getField("h"))
      val bucket = aggregate(bc, lit(0L), (acc, s) =>
        acc + when(s.getField("pos"),
          call_function("shiftleft", lit(1L), s.getField("h"))).otherwise(lit(0L)))
      val singles = transform(sequence(lit(0), lit(nBits - 1)),
        i => struct(scoreAt(i).as("a"), maskAt(i).as("m")))
      val perturbs =
        if (m < 2) singles
        else {
          val idx = sequence(lit(0), lit(m - 1))
          val pairs = filter(flatten(transform(idx, i => transform(idx, j =>
            when(i < j, struct((scoreAt(i) + scoreAt(j)).as("a"),
              maskAt(i).bitwiseOR(maskAt(j)).as("m"))).otherwise(lit(null))))),
            x => x.isNotNull)
          concat(singles, pairs)
        }
      val flips = transform(slice(array_sort(perturbs), 1, nProbe - 1),
        s => bucket.bitwiseXOR(s.getField("m")))
      concat(array(bucket), flips)
    })
    element_at(probes, 1)
  }
}
