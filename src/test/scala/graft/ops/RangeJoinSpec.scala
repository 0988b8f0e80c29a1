package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive theta join, across band boundaries") {
    val points = (0L to 50L).map(p => (p, s"p$p")).toDF("t", "tag")
    val intervals = Seq((0L, 10L, 20L), (1L, 15L, 16L), (2L, 19L, 35L), (3L, 48L, 60L))
      .toDF("id", "s", "e")
    for (band <- Seq(1L, 3L, 7L, 100L)) {
      val banded = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", band)
        .select("id", "t")
      val naive = points.join(intervals,
        $"t" >= $"s" && $"t" < $"e").select("id", "t")
      assert(banded.exceptAll(naive).count() === 0 &&
        naive.exceptAll(banded).count() === 0, s"bandWidth=$band")
    }
  }

  test("fractional bounds: a point past the last integer band is still found") {
    // [5.0, 10.5) with bandWidth 10: the old floor((end-1)/bw) band math
    // stopped at band 0 and silently dropped point 10.2 in band 1
    val points = Seq((10.2, "x"), (10.6, "y")).toDF("t", "tag")
    val intervals = Seq((0L, 5.0, 10.5)).toDF("id", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 10L)
      .select("tag").as[String].collect().toSeq
    assert(out === Seq("x")) // 10.2 in [5.0, 10.5); 10.6 out
  }

  test("empty interval [s, s) matches nothing") {
    val points = Seq(5L).toDF("t")
    val intervals = Seq((1L, 5L, 5L)).toDF("id", "s", "e")
    assert(RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 4L).count() === 0)
  }
}
