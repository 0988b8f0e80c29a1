package graft.pipeline

import graft.ingest.LoomSchema
import org.apache.spark.sql.{DataFrame, Row}

/** S9 — the JDBC upsert sink (reference src/main_01.py:208-305).
  *
  * The reference's dominant performance bug is 2–3 synchronous SQL
  * round-trips PER ROW (existence probe + INSERT-proc/UPDATE,
  * src/main_01.py:242-248, :294-296 — SURVEY §4.1 "batching writes").
  * The engine replaces that with:
  *
  *   1. engine-side merge first (Q11 last-writer-wins) so the sink never
  *      sees intra-batch duplicates;
  *   2. `foreachPartition` + JDBC batch `INSERT ... ON DUPLICATE KEY
  *      UPDATE` (MariaDB upsert) with `addBatch`/`executeBatch` — one
  *      round-trip per `batchSize` rows per partition, executed in
  *      parallel across executors.
  *
  * Statement construction is separated from execution so it is
  * unit-testable without a live database; `write` takes a connection
  * factory for the same reason.
  */
object JdbcUpsertSink {

  /** MariaDB-dialect batched upsert statement for the loom table. */
  def upsertSql(table: String, columns: Seq[String], keyCols: Seq[String]): String = {
    val collist = columns.map(c => s"`$c`").mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    val updates = columns.filterNot(keyCols.contains)
      .map(c => s"`$c` = VALUES(`$c`)").mkString(", ")
    s"INSERT INTO `$table` ($collist) VALUES ($placeholders) " +
      s"ON DUPLICATE KEY UPDATE $updates"
  }

  /** Distributed batched write. One connection per partition, one
    * executeBatch per `batchSize` rows — the reference's per-row probe
    * becomes O(rows / batchSize) round-trips spread over the cluster. */
  def write(df: DataFrame, table: String,
            connectionFactory: () => java.sql.Connection,
            keyCols: Seq[String] = LoomSchema.primaryKey,
            batchSize: Int = 1000): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertSql(table, columns, keyCols)
    df.foreachPartition { rows: Iterator[Row] =>
      val conn = connectionFactory()
      try {
        conn.setAutoCommit(false)
        val stmt = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { row =>
          columns.indices.foreach(i => stmt.setObject(i + 1, row.get(i)))
          stmt.addBatch()
          n += 1
          if (n % batchSize == 0) { stmt.executeBatch(); conn.commit() }
        }
        stmt.executeBatch(); conn.commit()
        stmt.close()
      } finally conn.close()
    }
  }
}
