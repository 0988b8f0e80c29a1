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

  test("AQE skew join: runtime split of the hot partition, result exact") {
    // the OTHER skew weapon next to salting: AQE detects the oversized
    // shuffle partition at runtime and splits it across tasks — no code
    // change to the join. Thresholds lowered so the toy hot key trips it.
    import spark.implicits._
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val skewed = spark.range(50000).select(
        when($"id" < 45000, 7L).otherwise($"id" % 32).as("k"),
        $"id".as("v"), lit("x" * 64).as("pad"))
      val dim = spark.range(32).select($"id".as("k"),
        concat(lit("name"), $"id").as("name"))
      val joined = skewed.join(dim, "k")
      // collect() executes joined's OWN query execution, finalizing the
      // adaptive plan in place (count() would plan a separate query and
      // leave this one at isFinalPlan=false)
      assert(joined.collect().length === 50000) // every row matches exactly once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).foreach(spark.conf.unset)
  }

  test("skewAudit: a constructed hot key reads its exact share and salt fan-out; null keys ranked") {
    import spark.implicits._
    // 1 key carrying 900 rows, 99 singleton keys, 1 null-key row
    val rows = (Seq.fill(900)(Option("hot")) ++
      (1 to 99).map(i => Option(s"k$i")) ++ Seq(Option.empty[String]))
      .toDF("k")
    val out = graft.ops.Staged.withStaged {
      Skew.skewAudit("k", topK = 3, parts = 8)(rows)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._4)
    }
    assert(out.length === 3)
    val hot = out.head
    assert(hot._1 === "hot" && hot._2 === 900L && hot._4 === 1L)
    assert(hot._3 === 9000L, "share_bp = 900/1000")
    assert(hot._5 === 1000L && hot._6 === 101L)
    // max/avg = 900·101/1000 = 90.9x -> 9090 at x100
    assert(hot._7 === 9090L)
    // ceil(900·8/1000) = 8 buckets to fit one average task
    assert(hot._8 === 8L)
    // the null bucket is audited under its literal name, not dropped
    val uniform = (1 to 64).flatMap(i => Seq.fill(4)(Option(s"u$i"))) ++
      Seq.fill(8)(Option.empty[String])
    val u = graft.ops.Staged.withStaged {
      Skew.skewAudit("k", topK = 1, parts = 8)(uniform.toDF("k"))
        .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    }
    assert(u.head._1 === "__null__" && u.head._2 === 8L,
      "null is the heaviest key and must rank first")
    assert(u.head._8 === 1L, "near-uniform table: don't salt")
  }

  test("suggestedShufflePartitions: bytes/128MB, floor at cores, capped, monotone — the q62 soak pair falls out") {
    import graft.ops.Skew.suggestedShufflePartitions
    // fixture scales resolve to the floor: wiring into Verify/Bench is
    // behavior-neutral at sf<=0.1 (a few hundred MB / 128MB < 32)
    assert(suggestedShufflePartitions(0L) === 32)
    assert(suggestedShufflePartitions(300L << 20) === 32)
    // the soak regime: the 10x derived corpus (~33 GB projected) asks
    // for ~264 partitions — the 256-ish sizing that cut q62's spill
    // 4x and its wall 2.6x in the round-10 control pair
    val tenX = suggestedShufflePartitions(33L << 30)
    assert(tenX === 264, s"got $tenX")
    // ceil, not floor: one byte past a boundary adds a partition
    assert(suggestedShufflePartitions((128L << 20) * 100) === 100 ||
      suggestedShufflePartitions((128L << 20) * 100, minParts = 1) === 100)
    assert(suggestedShufflePartitions((128L << 20) * 100 + 1, minParts = 1) === 101)
    // monotone in input bytes; capped at the scheduler-sanity bound
    assert(suggestedShufflePartitions(1L << 50) === 200000)
    val seq = Seq(1L << 28, 1L << 32, 1L << 36, 1L << 40, 1L << 44)
      .map(suggestedShufflePartitions(_))
    assert(seq === seq.sorted)
    // custom floor (the SPARK_GRAFT_CPUS wiring)
    assert(suggestedShufflePartitions(0L, minParts = 8) === 8)
    intercept[IllegalArgumentException] {
      suggestedShufflePartitions(-1L)
    }
  }

  test("dirBytes: recursive on-disk size, zero for a missing path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-bytes")
    try {
      java.nio.file.Files.write(dir.resolve("a.bin"), new Array[Byte](1000))
      val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
      java.nio.file.Files.write(sub.resolve("b.bin"), new Array[Byte](500))
      val conf = new org.apache.hadoop.conf.Configuration()
      assert(graft.ops.Skew.dirBytes(conf, dir.toString) === 1500L)
      assert(graft.ops.Skew.dirBytes(conf, s"$dir/nope") === 0L)
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }

  test("fanOutForCpu: engages only when the recorded scan parallelism is under the core count; results unchanged") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).selectExpr("id", "id * 3 as v").coalesce(1)
    val key = Skew.ScanParallelismKey
    val prev = spark.conf.getOption(key)
    try {
      // unset -> structural no-op (the cluster default): same plan object
      spark.conf.unset(key)
      assert(Skew.fanOutForCpu(df, Seq(col("id"))).queryExecution
        .analyzed eq df.queryExecution.analyzed)
      // wide layout recorded -> still a no-op
      spark.conf.set(key, "10000")
      assert(Skew.fanOutForCpu(df, Seq(col("id"))).queryExecution
        .analyzed eq df.queryExecution.analyzed)
      // thin layout recorded -> id-hash repartition to defaultParallelism,
      // deterministic (hash, not round-robin) and value-identical
      spark.conf.set(key, "1")
      val fanned = Skew.fanOutForCpu(df, Seq(col("id")))
      assert(fanned.rdd.getNumPartitions ===
        spark.sparkContext.defaultParallelism)
      assert(fanned.orderBy("id").collect().toSeq ===
        df.orderBy("id").collect().toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("recordScanParallelism: ceil(dirBytes/maxPartitionBytes), floored at 1") {
    val key = Skew.ScanParallelismKey
    val prev = spark.conf.getOption(key)
    try {
      Skew.recordScanParallelism(spark, "/root/testdata/sf0.001")
      // the fixture dir is far under one 128 MB split -> 1
      assert(spark.conf.get(key) === "1")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
