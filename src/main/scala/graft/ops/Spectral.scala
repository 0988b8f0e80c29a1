package graft.ops

import graft.functions.MomentsAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic spectral embedding post-processing: the dominant
  * principal component by power iteration (q139) and the
  * "all-but-the-top" residual that projects it out (q140) — the
  * standard post-processing for learned embeddings whose mass
  * concentrates in a few dominant directions (Mu & Viswanath, ICLR
  * 2018: centering + top-PC removal makes cosine geometry markedly
  * more discriminative), and the spectral member of the operator
  * families next to the trained ones (k-means q124, PQ q99) and the
  * model-free ones (JL q138).
  *
  * Every arithmetic step is EXACT integer math so a DuckDB oracle
  * reproduces the whole computation bit-for-bit:
  *   - inputs quantize to ×10⁴ BIGINTs (the q124/q138 discipline);
  *   - the mean is the integer round-half-up of S/n computed with
  *     positive-operand floor division — no float division anywhere;
  *   - the scatter matrix is exact integer algebra over one
  *     [[MomentsAgg]] pass (A = M − μSᵀ − Sμᵀ + nμμᵀ);
  *   - each power-iteration round is a 128-bit-exact mat-vec
  *     (BigInt here ≡ HUGEINT in the oracle) renormalized to ×10⁴
  *     scale by positive-operand integer division;
  *   - the sign is canonicalized by the largest-|component| rule
  *     (smallest index on ties) so "a direction" has one
  *     representation.
  *
  * Scale: the distributed work is ONE corpus pass producing a single
  * d²+d+1-long state (map-side partials, vectors never shuffle); the
  * driver's power iteration is O(rounds·d²) on a 33 KB matrix —
  * independent of corpus size, the same bounded-driver-work contract
  * as BPE's capped merge loop. The q140 apply step is a pure per-row
  * projection against broadcast literals: no shuffle, nothing that
  * scales with the corpus.
  */
object Spectral {

  /** ×10⁴ quantization of a float/double array column (q124/q138 form:
    * Spark's BigDecimal HALF_UP ≡ DuckDB's round-half-away on doubles). */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 10000).cast("long"))

  /** One-pass integer moments (M = Σxxᵀ, S = Σx, n) of the ×10⁴-
    * quantized `vecCol`, driver-collected — bounded at d²+d+1 longs
    * however large the corpus. Rows whose vector length ≠ d are
    * excluded (ragged rows can't enter a fixed-d scatter). */
  def moments(emb: DataFrame, vecCol: String, d: Int): Array[Long] = {
    import emb.sparkSession.implicits._
    emb.filter(size(col(vecCol)) === d)
      .select(quantize(col(vecCol)).as("xq"))
      .as[Array[Long]]
      .select(new MomentsAgg(d).toColumn)
      .head()
  }

  /** Integer round-half-up of s/n for n > 0 via positive-operand floor
    * division — the engine-independent rounding both sides share. */
  private[ops] def intMean(s: Long, n: Long): Long = {
    val q = (2L * math.abs(s) + n) / (2L * n)
    if (s >= 0) q else -q
  }

  /** The ×10⁴-scaled dominant eigenvector of the centered scatter
    * matrix after `rounds` power-iteration rounds, sign-canonicalized.
    * Exact integer arithmetic end to end (see object doc). */
  def pc1Quantized(emb: DataFrame, vecCol: String, d: Int,
                   rounds: Int): Array[Long] = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val st = moments(emb, vecCol, d)
    val n = st(d * d + d)
    require(n > 0, "pc1 of an empty corpus")
    val s = Array.tabulate(d)(j => st(d * d + j))
    val mu = s.map(intMean(_, n))
    // centered scatter, exact: A = M − μSᵀ − Sμᵀ + nμμᵀ
    val a = Array.tabulate(d, d) { (j, k) =>
      BigInt(st(j * d + k)) - BigInt(mu(j)) * s(k) - BigInt(s(j)) * mu(k) +
        BigInt(n) * mu(j) * mu(k)
    }
    // md5-seeded ±10⁴ start vector (the q138 sign convention, 'pc' domain)
    var v = Array.tabulate(d)(j => BigInt(if (md5HighBit(s"pc|$j")) 10000 else -10000))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d)(j => (0 until d).map(k => a(j)(k) * v(k)).sum)
      val m = w.map(_.abs).max
      if (m != 0)
        v = w.map(x => x.sign * ((x.abs * 10000) / m))
    }
    // canonical sign: component of largest |value| (smallest index on
    // ties) is non-negative
    val jStar = (0 until d).minBy(j => (-v(j).abs, j))
    val out = if (v(jStar).sign < 0) v.map(-_) else v
    out.map(_.toLong)
  }

  /** q139 surface: one row per dimension, `(pos, pc1_q)`. */
  def pc1Deterministic(emb: DataFrame, vecCol: String, d: Int = 64,
                       rounds: Int = 3): DataFrame = {
    val v = pc1Quantized(emb, vecCol, d, rounds)
    import emb.sparkSession.implicits._
    v.toSeq.zipWithIndex.map { case (x, j) => (j.toLong, x) }
      .toDF("pos", "pc1_q")
  }

  /** "All-but-the-top" (q140): center each vector and project out the
    * dominant component, in EXACT integers — the emitted residual is
    * rᵢ·D where D = v·v (so no division and no rounding exist at all;
    * consumers divide by D·10⁴ to recover embedding units, and cosine /
    * distance RATIOS are invariant under the fixed scale). Output:
    * `(id, proj_q, resid_q)` with proj_q = c·v (×10⁻⁸ units of the
    * projection coefficient times D… exactly t = Σ cᵢvᵢ) and resid_q
    * the comma-joined d-vector cᵢ·D − t·vᵢ.
    *
    * Apply is a pure per-row projection against broadcast literal μ/v —
    * zero shuffle at any corpus size; the model is d+d bounded longs
    * from [[pc1Quantized]]'s one-pass + bounded-driver train step. */
  def removeTopComponent(emb: DataFrame, idCol: String, vecCol: String,
                         d: Int = 64, rounds: Int = 3): DataFrame = {
    val st = moments(emb, vecCol, d)
    val n = st(d * d + d)
    require(n > 0, "removeTopComponent on an empty corpus")
    val mu = Array.tabulate(d)(j => intMean(st(d * d + j), n))
    val v = pc1Quantized(emb, vecCol, d, rounds)
    val bigD = v.map(x => x * x).sum // ≤ d·10⁸ — fits Long with headroom
    val muLit = array(mu.map(lit(_)): _*)
    val vLit = array(v.map(lit(_)): _*)
    emb.filter(size(col(vecCol)) === d)
      .select(col(idCol), zip_with(quantize(col(vecCol)), muLit, _ - _).as("__c"))
      .select(col(idCol), col("__c"),
        aggregate(zip_with(col("__c"), vLit, _ * _), lit(0L), _ + _).as("proj_q"))
      .select(col(idCol), col("proj_q"),
        array_join(zip_with(col("__c"), vLit,
          (c, vi) => c * lit(bigD) - col("proj_q") * vi), ",").as("resid_q"))
  }

  /** Driver-side md5 high bit of a short string — the Scala twin of the
    * `substr(md5(x), 1, 1) >= '8'` convention q138's column form and
    * every md5-seeded oracle share. */
  private def md5HighBit(key: String): Boolean = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    (dig(0) & 0x80) != 0
  }
}
