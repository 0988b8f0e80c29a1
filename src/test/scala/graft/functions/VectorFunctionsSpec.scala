package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  test("unitNormalize yields norm-1 vectors; zero vector passes through") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("id", "v")
    val out = df.select(col("id"), unitNormalize(col("v")).as("u"),
        norm(unitNormalize(col("v"))).as("n"))
      .as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
    assert(out(0)._2 === Seq(0.6, 0.8) && math.abs(out(0)._3 - 1.0) < 1e-12)
    assert(out(1)._2 === Seq(0.0, 0.0) && out(1)._3 === 0.0)
  }

  test("quantizeInt8 scales max-abs to ±127, ties away from zero, zeros stay zero") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val df = Seq((1L, Seq(2.0f, -4.0f, 1.0f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
    val out = df.select(col("id"), quantizeInt8(col("v")).as("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(out(0)._2 === Seq(64L, -127L, 32L)) // 2*127/4 = 63.5 → 64 (away from zero)
    assert(out(1)._2 === Seq(0L, 0L, 0L))
  }
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f)),
    (2L, Seq(2.0f, 0.0f, 0.0f)),
    (3L, Seq(1.0f, 1.0f, 0.0f))
  ).toDF("id", "v")

  test("dot, norm, cosine, l2 on known vectors") {
    val row = vecs.filter(col("id") === 3)
      .select(
        VectorFunctions.dot(col("v"), col("v")).as("d"),
        VectorFunctions.norm(col("v")).as("n"),
        VectorFunctions.l2(col("v"), array(lit(0.0f), lit(0.0f), lit(0.0f))).as("l"))
      .as[(Double, Double, Double)].head()
    assert(row._1 === 2.0)
    assert(math.abs(row._2 - math.sqrt(2)) < 1e-12)
    assert(math.abs(row._3 - math.sqrt(2)) < 1e-12)
  }

  test("cosine: orthogonal → 0, parallel → 1 regardless of magnitude") {
    val a = vecs.filter(col("id") === 0).select(col("v").as("a"))
    val cross = a.crossJoin(vecs)
      .select(col("id"), round(VectorFunctions.cosine(col("a"), col("v")), 10).as("c"))
      .orderBy("id").as[(Long, Double)].collect().map(_._2)
    assert(cross(0) === 1.0) // self
    assert(cross(1) === 0.0) // orthogonal
    assert(cross(2) === 1.0) // parallel, scaled
    assert(math.abs(cross(3) - 1.0 / math.sqrt(2)) < 1e-9)
  }

  test("lshBucket: deterministic, parallel vectors share a bucket") {
    val b = vecs.select(col("id"), VectorFunctions.lshBucket(col("v"), 6).as("b"))
      .orderBy("id").as[(Long, Long)].collect().map(_._2)
    val b2 = vecs.select(col("id"), VectorFunctions.lshBucket(col("v"), 6).as("b"))
      .orderBy("id").as[(Long, Long)].collect().map(_._2)
    assert(b.toSeq === b2.toSeq)           // reproducible with no stored model
    assert(b(0) === b(2))                  // v and 2v project identically
    assert(b.forall(x => x >= 0 && x < 64)) // 6 bits
  }

  test("jlProject: float form is the integer form scaled; projection is linear") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(1.0f, 0.5f, -0.25f, 0.125f)),
      (2L, Seq(2.0f, 1.0f, -0.5f, 0.25f)),   // 2× row 1
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val out = df.select(col("id"),
        VectorFunctions.jlProjectQ(col("v"), 8).as("q"),
        VectorFunctions.jlProject(col("v"), 8).as("p"))
      .as[(Long, Seq[Long], Seq[Double])].collect().map(r => r._1 -> r).toMap
    val scale = math.sqrt(8.0)
    out.values.foreach { case (_, q, p) =>
      q.zip(p).foreach { case (qi, pi) =>
        assert(math.abs(qi / 10000.0 / scale - pi) < 1e-12)
      }
    }
    // linearity: 2× the input quantizes to 2× the sum (all inputs exact ×10⁴)
    assert(out(2L)._2 === out(1L)._2.map(_ * 2))
    assert(out(3L)._2.forall(_ === 0L))
  }

  test("jlProject: preserves pairwise cosine structure on the test embeddings (bounded distortion)") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.jlProject(col("embedding"), 16).as("p"))
    val rows = emb.as[(Long, Seq[Float], Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum)
    }
    val dist = for {
      (ia, va, pa) <- rows; (ib, vb, pb) <- rows if ia < ib
    } yield math.abs(cos(va.map(_.toDouble), vb.map(_.toDouble)) - cos(pa, pb))
    val mean = dist.sum / dist.size
    // 64 → 16 dims: JL distortion is bounded and, deterministically on
    // this fixture, small on average
    assert(mean < 0.2, s"mean cosine distortion $mean")
    // the tail is where JL pays for 16 dims: a lone worst pair lands
    // ~0.81 on this fixture (deterministic — fixed signs, fixed data);
    // the bound pins the ORDER of the tail, not a lucky draw
    assert(dist.max < 0.9, s"max cosine distortion ${dist.max}")
    // k = 16 puts the JL standard error at ~1/√k = 0.25, so per-pair
    // |Δcos| of 0.2–0.4 is the EXPECTED magnitude, not a defect; the
    // p90 pins that the distribution sits at that scale and no wider
    val p90 = dist.sorted.apply((dist.size * 9) / 10)
    assert(p90 < 0.45, s"p90 cosine distortion $p90")
  }
}
