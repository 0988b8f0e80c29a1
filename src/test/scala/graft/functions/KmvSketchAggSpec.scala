package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchAggSpec extends SparkSpec {
  import spark.implicits._

  private def md5h48(s: String): Long =
    java.lang.Long.parseUnsignedLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(6).map(b => f"${b & 0xff}%02x").mkString, 16)

  test("sketch is exact below k: bottom-k holds every distinct hash, sorted") {
    val agg = KmvSketchAgg[Long](8, identity)
    val out = Seq(5L, 3L, 9L, 3L, 1L, 5L).foldLeft(agg.zero)(agg.reduce)
    assert(out.toSeq === Seq(1L, 3L, 5L, 9L))
  }

  test("reduce caps at k smallest and ignores larger values") {
    val agg = KmvSketchAgg[Long](3, identity)
    val out = (10L to 1L by -1L).foldLeft(agg.zero)(agg.reduce)
    assert(out.toSeq === Seq(1L, 2L, 3L))
    // a later value above the current k-th min leaves the buffer untouched
    assert(agg.reduce(out, 7L).toSeq === Seq(1L, 2L, 3L))
  }

  test("merge is a sorted-distinct union capped at k") {
    val agg = KmvSketchAgg[Long](4, identity)
    val a = Array(1L, 4L, 9L)
    val b = Array(2L, 4L, 8L, 16L)
    assert(agg.merge(a, b).toSeq === Seq(1L, 2L, 4L, 8L))
    assert(agg.merge(b, a).toSeq === Seq(1L, 2L, 4L, 8L)) // commutative
    assert(agg.merge(a, Array.emptyLongArray).toSeq === a.toSeq)
  }

  test("result is partitioning-independent and duplicate-absorbing") {
    val vals = (1 to 5000).map(i => s"v${i % 1200}") // 1200 distinct, heavy dupes
    val agg = KmvSketchAgg[(String, Long)](64, _._2).toColumn
    def run(parts: Int): Seq[Long] = {
      val ds = vals.map(v => ("g", md5h48(v))).toDS().repartition(parts)
      ds.groupByKey(_._1).agg(agg.name("kmv")).collect().head._2.toSeq
    }
    val one = run(1)
    assert(run(7) === one)
    assert(one.length === 64)
    // duplicate-free input of the same distinct set yields the same sketch
    val distinctDs = vals.distinct.map(v => ("g", md5h48(v))).toDS()
    assert(distinctDs.groupByKey(_._1).agg(agg.name("kmv"))
      .collect().head._2.toSeq === one)
  }

  test("estimate: exact under k, within KMV error bounds over k") {
    val n = 10000
    val hashes = (1 to n).map(i => md5h48(s"item-$i"))
    val k = 256
    val agg = KmvSketchAgg[Long](k, identity)
    val sketch = hashes.foldLeft(agg.zero)(agg.reduce)
    val est = KmvSketchAgg.estimate(sketch, k)
    // stderr ~ 1/sqrt(k-2) ~ 6.3%; allow 3 sigma on this fixed input
    assert(math.abs(est - n) / n < 0.19, s"est=$est for n=$n")
    // below k: estimate is the exact count
    val small = hashes.take(100).foldLeft(agg.zero)(agg.reduce)
    assert(KmvSketchAgg.estimate(small, k) === 100.0)
  }
}
