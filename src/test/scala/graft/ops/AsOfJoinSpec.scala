package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at-or-before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 8L, 100.0), (1L, 15L, 200.0), (3L, 1L, 999.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"))
      .select("k", "ts", "tag", "matched_v", "matched_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out === Set(
      (1L, 10L, "a", Some(100.0), Some(8L)),  // 8 <= 10 < 15
      (1L, 20L, "b", Some(200.0), Some(15L)), // latest at-or-before 20
      (1L, 5L, "c", None, None),              // nothing before 5
      (2L, 10L, "d", None, None)))            // key has no right rows
  }

  test("a NULL payload on the matched right row is carried as NULL, not an older value") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 1L, Some(5.0)), (1L, 2L, None))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"))
      .select("matched_v", "matched_ts").head()
    // matched row is (ts=2, v=NULL): both fields from THAT row
    assert(Option(out.get(0)).isEmpty)
    assert(out.getLong(1) === 2L)
  }

  test("a NULL-timestamp right row never matches (no phantom carry-forward)") {
    // null ts sorts FIRST in the window — unfiltered, its payload would
    // be carried into every left row of the key as a fake match
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, Option.empty[Long], 9.99)).toDF("k", "ts", "v")
    val out = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"))
      .select("matched_v", "matched_ts").head()
    assert(Option(out.get(0)).isEmpty && Option(out.get(1)).isEmpty)
  }

  test("as-of join matches on exactly-equal timestamps") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"))
    assert(out.select("matched_v").as[Option[Double]].head() === Some(7.0))
  }

  test("time-bucketed hot-key variant is output-identical on a skewed fixture") {
    import org.apache.spark.sql.functions._
    // one pathologically hot key (800 left rows, right rows every 7 ticks,
    // so many buckets have no right row and need the cross-bucket carry)
    // plus a sparse key and a right-only key
    val left = ((0L until 800L).map(t => (1L, t * 3 % 997, s"e$t")) ++
      Seq((2L, 50L, "x"), (2L, 3L, "y"))).toDF("k", "ts", "tag")
    val right = ((0L until 120L).map(i => (1L, i * 7, i * 1.0)) ++
      Seq((2L, 40L, -1.0), (3L, 5L, -2.0))).toDF("k", "ts", "v")
    val plain = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"))
    val bucketed = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"),
      timeBucket = Some(ts => floor(ts / lit(50L))))
    assert(plain.exceptAll(bucketed).count() === 0 &&
      bucketed.exceptAll(plain).count() === 0)
    assert(bucketed.count() === left.count())
  }

  test("bucketed variant matches NULL join keys like the default path (window-group semantics)") {
    import org.apache.spark.sql.functions._
    // window partitionBy groups NULL keys (like groupBy), so the default
    // path matches them; the bucketed carry join must be null-safe or it
    // silently drops the cross-bucket carry for null-key rows
    val left = Seq((Option.empty[Long], 100L), (Some(1L), 100L)).toDF("k", "ts")
    val right = Seq((Option.empty[Long], 10L, 5.0), (Some(1L), 10L, 7.0)).toDF("k", "ts", "v")
    val plain = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"))
    val bucketed = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"),
      timeBucket = Some(ts => floor(ts / lit(50L)))) // carry must cross buckets
    assert(plain.exceptAll(bucketed).count() === 0 &&
      bucketed.exceptAll(plain).count() === 0)
    val nullKeyMatch = bucketed.filter(col("k").isNull)
      .select("matched_v").as[Option[Double]].head()
    assert(nullKeyMatch === Some(5.0))
  }

  test("bucketed variant keeps the null-ts contracts (left row kept, right row never matches)") {
    import org.apache.spark.sql.functions._
    val left = Seq((1L, Some(10L)), (1L, Option.empty[Long])).toDF("k", "ts")
    val right = Seq((1L, Option.empty[Long], 9.99), (1L, Some(4L), 1.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.join(left, right, Seq("k"), "ts", Seq("v"),
        timeBucket = Some(ts => floor(ts / lit(50L))))
      .select("ts", "matched_v").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(out === Set(
      (Some(10L), Some(1.0)),  // normal match survives bucketing
      (None, None)))           // null-ts left row kept, never matched
  }
}
