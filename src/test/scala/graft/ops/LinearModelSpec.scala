package graft.ops

import graft.SparkSpec

/** Linear classifier gate (q149): exact score arithmetic against an
  * independently-computed weight table, the OOV-scores-zero contract,
  * the keep threshold at logit 0, and partition invariance. */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  /** The contract's weight function, re-derived independently:
    * (first 12 md5 hex chars of "w|tok" as int) mod 2001, minus 1000. */
  private def weight(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"w|$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16) % 2001 - 1000
  }

  private def run(rows: Seq[(Long, String)], vocabSize: Int, parts: Int = 1)
      : Map[Long, (Long, Long, Long, Long)] = Staged.withStaged {
    rows.toDF("doc_id", "text").repartition(parts)
      .transform(LinearModel.linearGate("doc_id", "text", vocabSize))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("scores are the exact weight sums; keep is logit > 0; empty docs are absent") {
    val rows = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma"),
      (3L, ""))                                    // no tokens → absent
    val out = run(rows, vocabSize = 10)
    val (wa, wb, wg) = (weight("alpha"), weight("beta"), weight("gamma"))
    assert(out(1L) === ((3L, 3L, 2 * wa + wb, if (2 * wa + wb > 0) 1L else 0L)))
    assert(out(2L) === ((2L, 2L, wb + wg, if (wb + wg > 0) 1L else 0L)))
    assert(!out.contains(3L))
  }

  test("OOV tokens score zero through the vocab cut; n_in_vocab tracks the cut") {
    // frequencies: common×3, mid×2, rare×1 → vocabSize=2 keeps
    // common+mid (count desc, token asc), rare is OOV
    val rows = Seq(
      (1L, "common common mid rare"),
      (2L, "common mid"))
    val out = run(rows, vocabSize = 2)
    val (wc, wm) = (weight("common"), weight("mid"))
    assert(out(1L) === ((4L, 3L, 2 * wc + wm, if (2 * wc + wm > 0) 1L else 0L)))
    assert(out(2L) === ((2L, 2L, wc + wm, if (wc + wm > 0) 1L else 0L)))
    // the whole-corpus scores must differ from a full-vocab run iff
    // the rare token carries nonzero weight
    val full = run(rows, vocabSize = 10)
    assert(full(1L)._3 === 2 * wc + wm + weight("rare"))
  }

  test("a document scoring exactly zero is NOT kept (strict threshold)") {
    // a doc whose only token is OOV: score 0 → keep 0
    val rows = Seq(
      (1L, "filler filler filler"),                // holds the vocab slot
      (2L, "loner"))
    val out = run(rows, vocabSize = 1)
    assert(out(2L)._2 === 0L)                      // OOV
    assert(out(2L)._3 === 0L && out(2L)._4 === 0L)
  }

  test("partition count cannot move any score") {
    val rows = (1L to 30L).map(i =>
      (i, (1L to (i % 7 + 1)).map(j => s"t${(i * j) % 11}").mkString(" ")))
    assert(run(rows, 5, parts = 1) === run(rows, 5, parts = 8))
  }
}
