package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Demonstrates the SCALE.md claim that bucketing the corpus by the ANN
  * cell id at write time makes candidate joins co-located: a join of two
  * tables bucketed on the same key plans with NO Exchange on either side.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of tables bucketed on the bucket key is shuffle-free") {
    // (warehouse dir is a static conf — the managed tables land in the
    // default ./spark-warehouse and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val emb = (1L to 200L).map(i => (i, i % 16)).toDF("vec_id", "cell")
      emb.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
        .saveAsTable("graft_corpus_bucketed")
      emb.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
        .saveAsTable("graft_queries_bucketed")
      val a = spark.table("graft_corpus_bucketed")
      val b = spark.table("graft_queries_bucketed")
        .withColumnRenamed("vec_id", "q_id")
      val joined = a.join(b, "cell")
      val plan = joined.queryExecution.explainString(SimpleMode)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // 200 ids over 16 cells: 8 cells of 13 + 8 of 12 → Σ cnt² = 2504
      assert(joined.count() === 8L * 13 * 13 + 8L * 12 * 12)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_corpus_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_queries_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
