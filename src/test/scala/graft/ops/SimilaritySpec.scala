package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(-1.0f, 0.0f)),
    (4L, Seq(0.8f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK: correct neighbor order for a known query") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", 3)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.map(_._2) === Seq(1L, 4L, 2L)) // by descending cosine to (1,0)
    assert(out.head._3 > 0.99)
    assert(out.map(_._4) === Seq(1L, 2L, 3L))
  }

  test("bruteForceTopK excludes self-matches") {
    val out = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 4)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() === 0)
    assert(out.groupBy("query_id").count().select(max("count")).as[Long].head() === 4)
  }

  test("ivfTopK: full probe of all centroids reproduces brute-force exactly") {
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 2)
    val ivf = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", 2,
      nCentroids = 2, nProbe = 2) // probing every cell → exact
    assert(brute.exceptAll(ivf).count() === 0 && ivf.exceptAll(brute).count() === 0)
  }

  test("ivfTopK: partial probe returns a subset of brute-force candidates, ranked") {
    val out = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", 3, nCentroids = 2, nProbe = 1)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._3) === out.map(_._3).sorted.reverse) // descending sim
  }

  test("cosineNearDupPairs finds the tight pair at high threshold") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.98, nBits = 2)
      .as[(Long, Long, Double)].collect().toSeq
    // (1,4) are 0.9/0.1 vs 0.8/0.2 — cosine ≈ 0.9923; must appear if same bucket
    // (0,1) cosine ≈ 0.9939
    assert(pairs.forall(_._3 >= 0.98))
  }
}
