package graft.pipeline

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lands `Dataset.observe` metrics in a [[RunLog]] — the engine-native
  * rendition of the reference's run counters (processed / imported /
  * discarded labels, src/main_01.py:214-260): where the reference
  * re-counts collections with extra queries, the engine collects the
  * counters as observed metrics DURING the action that runs the
  * pipeline (zero extra jobs) and this listener formats them into the
  * bounded log ring as they arrive.
  *
  * Register once per session: `spark.listenerManager.register(...)`.
  * Delivery is asynchronous (Spark's listener bus), like every
  * QueryExecutionListener.
  */
final class ObservedMetricsLog(log: RunLog, prefix: String = "corpus_")
    extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    qe.observedMetrics.toSeq.sortBy(_._1).foreach { case (name, row) =>
      if (name.startsWith(prefix)) {
        val fields = row.schema.fieldNames
          .map(f => s"$f=${row.getAs[Any](f)}").mkString(" ")
        log.add(s"$name $fields", "info")
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()
}
