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
}
