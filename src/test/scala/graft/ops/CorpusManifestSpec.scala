package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusManifestSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)], shardSize: Long = 4L) =
    Staged.withStaged {
      CorpusManifest.releaseManifest("doc_id", "text", shardSize)(
          docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, String, String)].collect()
        .sortBy(_._1).toSeq
    }

  /** The whole digest chain recomputed in plain JVM MD5. */
  private def refManifest(docs: Seq[(Long, String)], shardSize: Long = 4L) = {
    val shards = docs.groupBy(_._1 / shardSize).toSeq.sortBy(_._1).map {
      case (shard, ds) =>
        val sorted = ds.sortBy(_._1)
        (shard, ds.size.toLong, ds.map(_._2.length.toLong).sum,
          md5hex(sorted.map { case (id, t) => md5hex(s"$id:$t") }.mkString))
    }
    val root = md5hex(shards.map(_._4).mkString)
    shards.map { case (s, n, c, h) => (s, n, c, h, root) }
  }

  test("manifest equals the plain-JVM md5 chain and ignores partition layout") {
    val docs = (0L until 11L).map(i => (i, s"doc $i body ${"x" * (i % 5).toInt}"))
    val want = refManifest(docs)
    assert(run(docs) === want)
    // partition layout can never reach the digest
    val repart = Staged.withStaged {
      CorpusManifest.releaseManifest("doc_id", "text", 4L)(
          docs.toDF("doc_id", "text").repartition(13))
        .as[(Long, Long, Long, String, String)].collect().sortBy(_._1).toSeq
    }
    assert(repart === want)
  }

  test("a one-character edit changes exactly its shard hash and the root") {
    val docs = (0L until 12L).map(i => (i, s"stable body $i"))
    val edited = docs.updated(6, (6L, "stable body 6!"))
    val before = run(docs)
    val after = run(edited)
    assert(before.map(_._1) === after.map(_._1))
    before.zip(after).foreach { case ((s, n, _, h1, r1), (_, _, _, h2, r2)) =>
      if (s == 1L) assert(h1 !== h2, "edited shard must move")
      else assert(h1 === h2, s"shard $s is sealed — must not move")
      assert(r1 !== r2, "root sees every edit")
    }
  }

  test("doc hash binds the id: permuting ids over the same texts changes the manifest") {
    val a = Seq((0L, "alpha"), (1L, "beta"))
    val b = Seq((0L, "beta"), (1L, "alpha")) // same text multiset, swapped rows
    assert(run(a, 4L).map(_._4) !== run(b, 4L).map(_._4))
  }

  // ---- additiveManifest: order-free XOR digest ----

  private def digest60(id: Long, text: String): Long =
    java.lang.Long.parseLong(md5hex(s"$id:$text").take(15), 16)

  private def runAdd(docs: Seq[(Long, String)], shardSize: Long = 4L) =
    Staged.withStaged {
      CorpusManifest.additiveManifest("doc_id", "text", shardSize)(
          docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    }

  test("additiveManifest equals the plain-JVM XOR chain; root = XOR of all docs") {
    val docs = (0L until 11L).map(i => (i, s"doc $i payload"))
    val want = docs.groupBy(_._1 / 4).toSeq.sortBy(_._1).map { case (s, ds) =>
      (s, ds.size.toLong, ds.map(d => digest60(d._1, d._2)).reduce(_ ^ _))
    }
    val root = docs.map(d => digest60(d._1, d._2)).reduce(_ ^ _)
    assert(runAdd(docs) === want.map { case (s, n, x) => (s, n, x, root) })
    // partition layout can never reach the digest
    val repart = Staged.withStaged {
      CorpusManifest.additiveManifest("doc_id", "text", 4L)(
          docs.toDF("doc_id", "text").repartition(7))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(repart === runAdd(docs))
  }

  test("additiveManifest is delete-composable: removing a doc re-XORs its digest out") {
    val docs = (0L until 8L).map(i => (i, s"v$i"))
    val full = runAdd(docs)
    val without5 = runAdd(docs.filterNot(_._1 == 5L))
    // shard 1 (ids 4..7) loses exactly digest60(5); shard 0's digest
    // is untouched (only the root moves)
    assert((without5.head._1, without5.head._2, without5.head._3) ===
      (full.head._1, full.head._2, full.head._3))
    assert(without5.head._4 !== full.head._4, "root sees the delete")
    val s1Full = full(1); val s1Cut = without5(1)
    assert(s1Cut._2 === s1Full._2 - 1)
    assert(s1Cut._3 === (s1Full._3 ^ digest60(5L, "v5")))
    // and the count catches what XOR alone cannot: delivering a doc
    // TWICE cancels its own digest (xor of two copies = 0) but bumps
    // n_docs — the duplicate is visible
    val dup = runAdd(docs ++ Seq((5L, "v5")))
    assert(dup(1)._3 === (s1Full._3 ^ digest60(5L, "v5")))
    assert(dup(1)._2 === s1Full._2 + 1, "count exposes the duplicate")
  }

  test("append-only growth: sealed shards stay byte-stable, new shards appear, root moves") {
    val base = (0L until 8L).map(i => (i, s"d$i"))
    val grown = base ++ (8L until 12L).map(i => (i, s"d$i"))
    val m1 = run(base)
    val m2 = run(grown)
    assert(m1.size === 2 && m2.size === 3)
    // the two sealed shards are untouched by the append
    assert(m1.map(x => (x._1, x._2, x._3, x._4)) ===
      m2.take(2).map(x => (x._1, x._2, x._3, x._4)))
    assert(m1.head._5 !== m2.head._5, "root covers the new shard")
  }
}
