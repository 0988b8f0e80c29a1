package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic PCA (q139) + all-but-the-top (q140): planted-direction
  * recovery, centering invariance, EXACT residual orthogonality (an
  * integer identity, not an approximation), sign canonicalization, and
  * partition invariance of the one-pass moments aggregation. */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8

  /** Vectors = t·u + small fixed noise, for u the planted direction —
    * dominant eigenvalue far above the rest, so 3 rounds converge. */
  private def planted(offset: Double = 0.0) = {
    val u = Array(0.6, -0.3, 0.45, 0.15, -0.6, 0.3, -0.15, 0.45)
    val rows = (0 until 40).map { r =>
      val t = (r % 9) - 4.0 // symmetric spread −4..4 along u
      val noise = (i: Int) => 0.01 * (((r * 7 + i * 3) % 5) - 2)
      (r.toLong, (0 until d).map(i => (t * u(i) + noise(i) + offset).toFloat).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def cosineWith(v: Array[Long], u: Array[Double]): Double = {
    val dot = (0 until d).map(i => v(i) * u(i)).sum
    val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
    val nu = math.sqrt(u.map(x => x * x).sum)
    dot / (nv * nu)
  }

  test("pc1 recovers a planted dominant direction") {
    val v = Spectral.pc1Quantized(planted(), "embedding", d, rounds = 3)
    val u = Array(0.6, -0.3, 0.45, 0.15, -0.6, 0.3, -0.15, 0.45)
    assert(math.abs(cosineWith(v, u)) > 0.999,
      s"pc1 ${v.mkString(",")} not aligned with planted direction")
  }

  test("centering: a constant offset does not change the direction") {
    val a = Spectral.pc1Quantized(planted(), "embedding", d, rounds = 3)
    val b = Spectral.pc1Quantized(planted(offset = 0.7), "embedding", d, rounds = 3)
    // offset shifts the mean only; the centered scatter is unchanged up
    // to ±1 quantization of the per-dim mean, so directions must agree
    // to well under a degree
    val cos = (0 until d).map(i => a(i).toDouble * b(i)).sum /
      (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    assert(cos > 0.9999, s"offset moved pc1: cos=$cos")
  }

  test("sign canonicalization: the largest-|component| entry is non-negative") {
    val v = Spectral.pc1Quantized(planted(), "embedding", d, rounds = 3)
    val jStar = (0 until d).minBy(j => (-math.abs(v(j)), j))
    assert(v(jStar) >= 0)
  }

  test("intMean rounds half up by magnitude") {
    assert(Spectral.intMean(7, 2) === 4)   // 3.5 → 4
    assert(Spectral.intMean(-7, 2) === -4) // −3.5 → −4
    assert(Spectral.intMean(6, 4) === 2)   // 1.5 → 2
    assert(Spectral.intMean(5, 4) === 1)   // 1.25 → 1
    assert(Spectral.intMean(-5, 4) === -1)
    assert(Spectral.intMean(0, 3) === 0)
  }

  test("residual is EXACTLY orthogonal to pc1 — an integer identity") {
    // r·v = Σ(cᵢD − t·vᵢ)vᵢ = D·(c·v) − t·D = 0 in exact integers: the
    // scaled-residual formulation removes the component perfectly, not
    // approximately
    val emb = planted()
    val v = Spectral.pc1Quantized(emb, "embedding", d, rounds = 3)
    val out = Spectral.removeTopComponent(emb, "vec_id", "embedding", d, rounds = 3)
      .collect()
    assert(out.length === 40)
    out.foreach { row =>
      val resid = row.getAs[String]("resid_q").split(",").map(_.toLong)
      val dot = (0 until d).map(i => BigInt(resid(i)) * v(i)).sum
      assert(dot === BigInt(0), s"vec ${row.getLong(0)}: r·v = $dot")
    }
  }

  test("projection coefficient tracks the planted position along u") {
    // rows were built at t = (r % 9) − 4 along u: proj_q must order rows
    // exactly by t (u·u > 0 fixed), up to the canonical global sign
    val emb = planted()
    val out = Spectral.removeTopComponent(emb, "vec_id", "embedding", d, rounds = 3)
      .select("vec_id", "proj_q").as[(Long, Long)].collect().toMap
    val byT = (0 until 40).groupBy(r => (r % 9) - 4)
    val sign = math.signum(
      (out(8L /* t=4 */) - out(4L /* t=0 */)).toDouble) // orient once
    for (t1 <- -4 to 3; r1 = byT(t1).head; r2 = byT(t1 + 1).head)
      assert(sign * out(r2.toLong) > sign * out(r1.toLong),
        s"proj_q not monotone in t at t=$t1")
  }

  test("moments pass is partition-invariant") {
    val emb = planted()
    val a = Spectral.pc1Quantized(emb.repartition(1), "embedding", d, rounds = 3)
    val b = Spectral.pc1Quantized(emb.repartition(7, col("vec_id")), "embedding", d, rounds = 3)
    assert(a.toSeq === b.toSeq)
  }

  test("moments pass: map-side partial aggregation — the shuffle carries bounded state, not vectors") {
    val df = planted()
      .select(Spectral.quantize(col("embedding")).as("xq")).as[Array[Long]]
      .select(new graft.functions.MomentsAgg(d).toColumn.name("m"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("partial_momentsagg") || p.contains("partial_"), p)
  }

  test("ragged rows are excluded, not mis-summed") {
    val ragged = Seq((100L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val emb = planted().union(ragged)
    val v = Spectral.pc1Quantized(emb, "embedding", d, rounds = 3)
    val clean = Spectral.pc1Quantized(planted(), "embedding", d, rounds = 3)
    assert(v.toSeq === clean.toSeq)
  }
}
