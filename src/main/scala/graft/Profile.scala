package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): run named queries
  * once each under a stage-metrics listener and print, per query, the
  * wall time plus every stage's duration / task count / shuffle and
  * spill bytes — the attribution the bench's single number can't give.
  * Also dumps `.explain("formatted")` to plans/<tag>/<query>_<suffix>.txt
  * when SPARK_GRAFT_PLANDIR is set.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Profile q207_host_quota q133_corpus_pipeline_clean"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.get("SPARK_GRAFT_PLANDIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLANSUFFIX", "before")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.ops.Skew.suggestedShufflePartitions(
        graft.ops.Skew.dirBytes(
          new org.apache.hadoop.conf.Configuration(), sfDir),
        minParts = cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("SPARK_GRAFT_PLANSTR", "2147483632"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Skew.recordScanParallelism(spark, sfDir)
    // SPARK_GRAFT_STAGEMODE=persist dumps plans with staging boundaries
    // left visible (Staged.stageCut's plan-inspection mode)
    sys.env.get("SPARK_GRAFT_STAGEMODE")
      .foreach(m => spark.conf.set("spark.graft.stageCutMode", m))

    // warmup identical to Bench so codegen/IO startup isn't charged
    Seq("lineitem", "orders", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()

    @volatile var collect = false
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (collect) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.add(f"  job ${js.jobId}%4d stages=${js.stageIds.size}%3d  $desc")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collect) {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add(
          f"  stage ${si.stageId}%4d ${dur / 1000.0}%8.3fs tasks=${si.numTasks}%4d " +
          f"in=${tm.inputMetrics.bytesRead / 1e6}%9.1fMB " +
          f"sR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%9.1fMB " +
          f"sW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
          f"spill=${tm.diskBytesSpilled / 1e6}%8.1fMB " +
          f"exeCpu=${tm.executorCpuTime / 1e9}%8.2fs " +
          f"exeRun=${tm.executorRunTime / 1e3}%8.2fs  ${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })

    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      stages.clear(); jobs.clear()
      collect = true
      val t0 = System.nanoTime()
      graft.ops.Staged.withStaged {
        val df = fn(spark, sfDir)
        planDir.foreach { pd =>
          new java.io.File(pd).mkdirs()
          val w = new java.io.PrintWriter(s"$pd/${name}_$planSuffix.txt")
          try w.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          finally w.close()
        }
        df.count()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      collect = false
      println(f"== $name  wall=$wall%.3fs  jobs=${jobs.size}  stages=${stages.size}")
      jobs.forEach(j => println(j))
      val arr = new java.util.ArrayList[String](stages)
      arr.sort(java.util.Comparator.naturalOrder())
      arr.forEach(s => println(s))
    }
    spark.stop()
  }
}
