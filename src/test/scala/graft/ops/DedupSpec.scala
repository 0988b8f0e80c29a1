package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                   // exact dupe of 0
    (2L, base.replace("tonight", "tomorrow")),    // near-dupe of 0
    (3L, "completely unrelated text about spark catalyst optimizer rules and physical plans here")
  ).toDF("doc_id", "text")

  test("explodedShingles (typed flatMap) is output-identical to the expression shingles") {
    val expr = docs.select(col("doc_id").as("doc"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("shingle"))
    val typed = Dedup.explodedShingles(docs, "doc_id", "text", 3)
    assert(expr.exceptAll(typed).count() === 0 && typed.exceptAll(expr).count() === 0)
  }

  test("explodedShingles: null text yields no rows; string ids use the fallback path") {
    val withNull = Seq((1L, base), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Dedup.explodedShingles(withNull, "doc_id", "text", 3)
      .filter(col("doc") === 2L).count() === 0)
    val stringIds = Seq(("doc-a", base), ("doc-b", base)).toDF("doc_id", "text")
    val out = Dedup.explodedShingles(stringIds, "doc_id", "text", 3)
    assert(out.schema("doc").dataType.typeName === "string")
    assert(out.filter(col("doc") === "doc-a").count() > 0)
    // full operators work on string ids via the fallback
    val pairs = Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.5)(stringIds)
      .collect()
    assert(pairs.length === 1 && pairs.head.getDouble(2) === 1.0)
  }

  test("exact dedup groups identical texts and keeps min id") {
    val out = Dedup.exact("doc_id", "text")(docs)
      .orderBy("keep_id").select("keep_id", "n_dupes")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngram Jaccard finds the near-dupe pair with high score, not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.3)(docs)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2))
    assert(keys.contains((0L, 1L)) && keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 1.0) // exact dupe
    assert(!keys.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("minhash LSH surfaces exact and near dupes as candidates") {
    val pairs = Dedup.minhashLshPairs("doc_id", "text", 3, 32, 4, 0.3)(docs)
      .as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 1.0)
    assert(keys.contains((0L, 2L))) // near-dup shares most shingles
    assert(!keys.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("simhash pairs: exact dupes at Hamming 0; unrelated docs excluded at tight radius") {
    val pairs = Dedup.simhashPairs("doc_id", "text", maxHamming = 10)(docs)
      .as[(Long, Long, Long)].collect().toSeq
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) === 0L)
    assert(!m.keySet.exists(k => k._1 == 3L || k._2 == 3L))
  }
}
