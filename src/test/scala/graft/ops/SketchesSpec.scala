package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("histogramQuantiles: exact on in-bin-uniform data, within binWidth of truth always") {
    // values 1..100, width 10: p50 rank = 50 → bin 5 (50..59 holds ranks
    // 50..59? bins: [0,10) ranks 1..9 … construct explicitly instead)
    val vals = (1L to 100L).map(v => ("k", v))
    val out = Staged.withStaged {
      Sketches.histogramQuantiles("key", col("v"), 10L, Seq(0.5, 0.9, 0.99))(
        vals.toDF("key", "v"))
        .as[(String, Double, Long, Double)].collect()
    }.map(r => r._2 -> r._4).toMap
    // exact percentile-disc values: 50, 90, 99
    assert(out.keySet === Set(0.5, 0.9, 0.99))
    out.foreach { case (q, est) =>
      val truth = math.ceil(q * 100).toLong
      assert(math.abs(est - truth) <= 10.0, s"q=$q est=$est truth=$truth")
    }
  }

  test("histogramQuantiles: grouped keys are independent; n counts the group") {
    val rows = (1L to 40L).map(v => ("small", v)) ++ (1L to 400L).map(v => ("big", v * 10))
    val out = Staged.withStaged {
      Sketches.histogramQuantiles("key", col("v"), 16L, Seq(0.5))(
        rows.toDF("key", "v")).as[(String, Double, Long, Double)].collect()
    }.map(r => r._1 -> (r._3, r._4)).toMap
    assert(out("small")._1 === 40L && out("big")._1 === 400L)
    assert(out("small")._2 < out("big")._2)
  }

  test("histogramQuantiles: partition-invariant (bin counts merge associatively)") {
    val rows = (1L to 500L).map(v => (s"k${v % 3}", v * 7 % 301))
    val df = rows.toDF("key", "v")
    val a = Staged.withStaged {
      Sketches.histogramQuantiles("key", col("v"), 16L)(df.coalesce(1))
        .as[(String, Double, Long, Double)].collect().toSet
    }
    val b = Staged.withStaged {
      Sketches.histogramQuantiles("key", col("v"), 16L)(df.repartition(7))
        .as[(String, Double, Long, Double)].collect().toSet
    }
    assert(a === b)
  }

  test("cmsFrequency: never underestimates; exact when collision-free; deeper sketch tightens a forced collision") {
    val docs = (Seq.fill(30)("alpha") ++ Seq.fill(7)("beta") ++
      (1 to 50).map(i => s"noise$i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def run(d: Int, w: Int) = Staged.withStaged {
      Sketches.cmsFrequency(col("text"), Seq("alpha", "beta", "ghost"), d, w)(docs)
        .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    }
    // a roomy sketch: estimates exact, ghost stays zero or tiny
    val roomy = run(4, 256)
    assert(roomy("alpha") === (("alpha", 30L, 30L, 0L)))
    assert(roomy("beta") === (("beta", 7L, 7L, 0L)))
    assert(roomy("ghost")._2 === 0L)
    // a 1-row 2-cell sketch FORCES collisions among 52 distinct tokens:
    // estimates stay upper bounds, and at least one probe overestimates
    val tiny = run(1, 2)
    Seq("alpha", "beta", "ghost").foreach { t =>
      assert(tiny(t)._3 >= tiny(t)._2, s"$t underestimated: ${tiny(t)}")
    }
    assert(tiny.values.map(_._4).sum > 0, s"no collision in a 2-cell sketch: $tiny")
    // depth can only tighten: min over more rows is never larger
    val deeper = run(4, 2)
    Seq("alpha", "beta", "ghost").foreach { t =>
      assert(deeper(t)._3 <= tiny(t)._3, s"$t loosened with depth: ${deeper(t)} vs ${tiny(t)}")
      assert(deeper(t)._3 >= deeper(t)._2)
    }
  }

  test("cmsFrequency: partition-invariant (matrix addition is order-free)") {
    val docs = (1L to 200L).map(i => (i, s"tok${i % 23} tok${i % 7}")).toDF("doc_id", "text")
    val a = Staged.withStaged {
      Sketches.cmsFrequency(col("text"), Seq("tok1", "tok5"), 3, 16)(docs.coalesce(1))
        .as[(String, Long, Long, Long)].collect().toSet
    }
    val b = Staged.withStaged {
      Sketches.cmsFrequency(col("text"), Seq("tok1", "tok5"), 3, 16)(docs.repartition(9))
        .as[(String, Long, Long, Long)].collect().toSet
    }
    assert(a === b)
  }

  test("histogramQuantiles: a narrower bin tightens the estimate toward the exact rank value") {
    val rows = (1L to 1000L).map(v => ("k", v))
    def estAt(width: Long): Double = Staged.withStaged {
      Sketches.histogramQuantiles("key", col("v"), width, Seq(0.9))(
        rows.toDF("key", "v")).as[(String, Double, Long, Double)].collect().head._4
    }
    val coarse = math.abs(estAt(128L) - 900.0)
    val fine = math.abs(estAt(8L) - 900.0)
    assert(fine <= coarse, s"fine=$fine coarse=$coarse")
    assert(fine <= 8.0 && coarse <= 128.0)
  }
}
