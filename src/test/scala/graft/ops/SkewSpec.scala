package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountSum equals the direct aggregation on a skewed key distribution") {
    // one hot key (90%) + long tail
    val rows = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 37}" else "hot", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    val salted = Skew.saltedCountSum(Seq("k"), "v", salts = 16)(df)
    assert(direct.exceptAll(salted).count() === 0 &&
      salted.exceptAll(direct).count() === 0)
  }

  test("generic salted two-phase: min/max merge correctly") {
    val df = (1 to 500).map(i => ("g" + i % 3, i)).toDF("k", "v")
    val out = Skew.salted(Seq("k"), 8,
      Seq(min("v").as("__mn"), max("v").as("__mx")),
      Seq(min("__mn").as("mn"), max("__mx").as("mx")))(df)
    val direct = df.groupBy("k").agg(min("v").as("mn"), max("v").as("mx"))
    assert(out.exceptAll(direct).count() === 0 &&
      direct.exceptAll(out).count() === 0)
  }
}
