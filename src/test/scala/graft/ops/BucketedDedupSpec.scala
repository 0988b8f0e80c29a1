package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** End-to-end 100 TB dedup story: stage the corpus bucketed by
  * content_hash once, then run every dedup pass shuffle-free —
  * the aggregation AND the incremental new-batch anti-join both plan
  * with no Exchange on the staged side.
  */
class BucketedDedupSpec extends SparkSpec {

  test("exact dedup over a hash-bucketed staging table: zero Exchange, output ≡ Dedup.exact") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    try {
      Dedup.writeHashBucketed(docs, "doc_id", "text", "graft_docs_hashed", 8)

      val deduped = Dedup.exactBucketed(spark, "graft_docs_hashed", "doc_id")
      val plan = deduped.queryExecution.explainString(SimpleMode)
      assert(!plan.contains("Exchange"), plan)
      // same answer as the one-shuffle operator on the raw frame
      val direct = Dedup.exact("doc_id", "text")(docs)
      assert(direct.exceptAll(deduped).count() === 0 &&
        deduped.exceptAll(direct).count() === 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_docs_hashed")
  }

  test("incremental batch vs staged corpus: anti-join on content_hash has no Exchange on either side") {
    val oldThreshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    try {
      Dedup.writeHashBucketed(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "graft_docs_seen", 8)
      Dedup.writeHashBucketed(docs, "doc_id", "text", "graft_docs_incoming", 8)
      val fresh = spark.table("graft_docs_incoming")
        .join(spark.table("graft_docs_seen").select("content_hash"),
          Seq("content_hash"), "left_anti")
      val plan = fresh.queryExecution.explainString(SimpleMode)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(fresh.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_docs_seen")
      spark.sql("DROP TABLE IF EXISTS graft_docs_incoming")
      oldThreshold match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
