package graft.queries

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** q179's attribution semantics on a corpus constructed to hit every
  * cell: each gate solely, a multi-gate doc, and a clean doc — the
  * sole/total/multi bookkeeping must reconcile exactly. */
class GateAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("gate attribution: sole/total/multi columns reconcile on a corpus hitting every cell") {
    // flags computed exactly as q179 does (doc_id chosen % 3 != 0 so
    // the injection never fires and the text is the whole signal)
    val docs = Seq(
      (1L, "one two"),                                          // short only (has stopword 'one'? no — but 'two'/'one' aren't batteries; still g_lang fires too!)
      (2L, "the quick brown fox jumps over lazy dogs tonight"), // clean
      (4L, "zz yy xx ww vv uu tt"),                             // lang only (7 distinct tokens, no battery hit)
      (5L, "the the the the the and and and and and"),          // rep (2*2<10) — battery hits so not lang
      (7L, "reach me at someone@example.com the quick brown fox jumps"), // pii only
      (8L, "a a a a a a")                                       // rep + ... battery hit 'a', distinct 1
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val flagged = docs
      .withColumn("__w", TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        when(size(col("__w")) < 5, 1L).otherwise(0L).as("g_short"),
        when(TextFunctions.langIdFromTokens(col("__w")) === "und", 1L)
          .otherwise(0L).as("g_lang"),
        when(size(array_distinct(col("__w"))) * 2 < size(col("__w")), 1L)
          .otherwise(0L).as("g_rep"),
        when(TextFunctions.emailCount(col("text")) +
          TextFunctions.phoneCount(col("text")) > 0, 1L)
          .otherwise(0L).as("g_pii"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(flagged(1L) === ((1L, 1L, 0L, 0L)), "short AND no battery hit = multi")
    assert(flagged(2L) === ((0L, 0L, 0L, 0L)), "clean")
    assert(flagged(4L) === ((0L, 1L, 0L, 0L)), "sole lang")
    assert(flagged(5L) === ((0L, 0L, 1L, 0L)), "sole rep (battery hits)")
    assert(flagged(7L) === ((0L, 0L, 0L, 1L)), "sole pii")
    assert(flagged(8L) === ((0L, 0L, 1L, 0L)), "rep; 'a' is an en stopword so lang passes")

    // the aggregate bookkeeping: sole columns count k=1 rows only,
    // n_clean + (k=1 total) + n_multi = n_docs
    val nf = flagged.values.toSeq.map { case (a, b, c, d) => a + b + c + d }
    val nClean = nf.count(_ == 0L); val nSole = nf.count(_ == 1L)
    val nMulti = nf.count(_ >= 2L)
    assert(nClean + nSole + nMulti === flagged.size)
    assert(nClean === 1 && nSole === 4 && nMulti === 1)
  }
}
