package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling probe for the q61 CC loop — not part of the API. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("CC_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", sys.env.getOrElse("CC_PF", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Staged.withStaged {
      var t0 = System.nanoTime()
      val pairs = Tables.documents(spark, sfDir)
        .transform(graft.ops.Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03))
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .distinct().persist()
      val nEdges = edges.count()
      println(f"PROBE edges=$nEdges built=${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      var labels = edges.select(col("u").as("doc"), col("u").as("cluster"))
        .distinct().localCheckpoint()
      println(f"PROBE init nodes=${labels.count()} t=${(System.nanoTime()-t0)/1e9}%.2f s")
      val jump = sys.env.get("CC_JUMP").contains("1")
      var converged = false
      var i = 0
      while (!converged && i < 20) {
        t0 = System.nanoTime()
        val prop = labels.withColumn("__self", lit(true))
          .unionByName(
            edges.join(labels.withColumnRenamed("doc", "v"), "v")
              .select(col("u").as("doc"), col("cluster"))
              .withColumn("__self", lit(false)))
          .groupBy("doc").agg(
            min("cluster").as("cluster"),
            min(when(col("__self"), col("cluster"))).as("__prev"))
        val stepped = if (jump)
          prop.join(labels.select(col("doc").as("cluster"), col("cluster").as("__l2")), "cluster")
            .select(col("doc"), col("__l2").as("cluster"), col("__prev"))
        else prop
        val obs = org.apache.spark.sql.Observation()
        val next = stepped.observe(obs, coalesce(
            sum(when(col("cluster") =!= col("__prev"), 1L).otherwise(0L)),
            lit(0L)).as("changed"))
          .select("doc", "cluster").localCheckpoint()
        val changed = obs.get("changed").asInstanceOf[Long]
        println(f"PROBE round=$i changed=$changed t=${(System.nanoTime()-t0)/1e9}%.2f s")
        converged = changed == 0L
        labels = next
        i += 1
      }
    }
    spark.stop()
  }
}
