package graft.ops

import graft.functions.{Num, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diversity coreset selection over an embedding column: greedy
  * k-center (farthest-point traversal). Round 1 picks the vector of
  * largest squared norm (farthest from the origin — a deterministic
  * seed needing no randomness); each later round picks the point
  * farthest (squared L2) from the CURRENT selected set. The greedy
  * sequence 2-approximates the optimal k-center cover radius
  * (Gonzalez 1985), and the emitted per-round distance is exactly that
  * shrinking cover-radius sequence — the standard recipe for carving a
  * small maximally-diverse eval/annotation subset out of a huge
  * corpus, the opposite knob from SemDeDup's redundancy removal.
  *
  * Scale shape: k driver rounds, each ONE scan + TakeOrdered(1) over
  * the staged (id, v, n2) projection — no pair join ever (brute-force
  * diversity is O(n²)); the selected set rides along as ≤ k literal
  * vectors inside the per-row distance expression (k ≤ 64 enforced, so
  * the plan stays kilobytes). dist²(x,c) expands to
  * n2x − 2·x·c + n2c, reusing the one precomputed row norm so each
  * round prices at k dot products per row, all inside whole-stage
  * codegen. The driver holds k rows — bounded, documented.
  */
object Coreset {

  /** Returns (round BIGINT 1-based, vec_id BIGINT, score_q4 DOUBLE):
    * score is the squared norm for round 1 and the squared distance to
    * the selected set at selection time for later rounds. Ties break
    * to the smallest id everywhere. */
  def kCenterGreedy(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val base = Staged.stage(emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("n2", VectorFunctions.dot(col("v"), col("v"))))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val centers = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    var r = 1
    while (r <= k) {
      val scored =
        if (centers.isEmpty) base.withColumn("__dmin", col("n2"))
        else {
          val ds = centers.map { case (cv, cn2) =>
            col("n2") - lit(2.0) * VectorFunctions.dot(col("v"),
              array(cv.map(lit).toSeq: _*)) + lit(cn2)
          }.toSeq
          base.withColumn("__dmin",
            if (ds.size == 1) ds.head else least(ds: _*))
        }
      // TakeOrdered(1): one reduction, one driver row per round. The
      // center's n2 literal is the ENGINE-computed value off the row —
      // bit-identical to what any later round's expression would fold.
      val row = scored.orderBy(desc("__dmin"), asc("id")).limit(1)
        .select("id", "v", "__dmin", "n2").collect()(0)
      picks += ((r.toLong, row.getLong(0), row.getDouble(2)))
      centers += ((row.getSeq[Double](1).toArray, row.getDouble(3)))
      r += 1
    }
    picks.toSeq.toDF("round", "vec_id", "score")
      .select(col("round"), col("vec_id"),
        Num.round4(col("score")).as("score_q4"))
  }
}
