package graft.pipeline

import graft.SparkSpec
import java.sql.DriverManager

/** Live JDBC round-trip for the upsert sink: the ANSI MERGE dialect
  * executes against an in-process embedded Derby (its jars ship with
  * Spark), so the batch/commit/upsert behavior of `write` is proven over
  * a real connection — not just statement construction. The MySQL arm
  * stays statement-level-tested in PipelineSpec (no MariaDB in the
  * sandbox); both dialects share the same bind/batch machinery exercised
  * here.
  */
class JdbcUpsertSinkSpec extends SparkSpec with org.scalatest.Retries {
  import spark.implicits._

  // Embedded Derby occasionally dies with an internal NPE ("baseCC is
  // null" in its conglomerate cache) when the full suite runs
  // concurrently — green in isolation and on every rerun; not our code
  // path. One retry (against a dropped-and-recreated table) absorbs it.
  override def withFixture(test: NoArgTest): org.scalatest.Outcome =
    if (isRetryable(test)) withRetry { super.withFixture(test) }
    else super.withFixture(test)

  private val url = "jdbc:derby:memory:graftsink;create=true"
  // serializable factory: captures only the URL string, not the spec
  private val factory: () => java.sql.Connection = {
    val u = url
    () => DriverManager.getConnection(u)
  }

  private def query(sql: String): Seq[(String, Int, String, Int)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val out = Seq.newBuilder[(String, Int, String, Int)]
      while (rs.next())
        out += ((rs.getString(1), rs.getInt(2), rs.getString(3), rs.getInt(4)))
      out.result()
    } finally conn.close()
  }

  test("ANSI MERGE upsert against live Derby: insert, last-writer-wins update, idempotent replay",
       org.scalatest.tagobjects.Retryable) {
    // quoted DDL: the MERGE dialect emits case-exact quoted identifiers.
    // Drop first so the Retryable rerun starts from a clean table even if
    // the first attempt died after the CREATE.
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute("DROP TABLE \"tblLoom\"")
    catch { case _: java.sql.SQLException => () } // didn't exist yet
    conn.createStatement().execute(
      """CREATE TABLE "tblLoom" (
        |  "DataTurno" VARCHAR(20) NOT NULL,
        |  "Tear" INT NOT NULL,
        |  "Status" VARCHAR(10),
        |  "Picks" INT,
        |  PRIMARY KEY ("DataTurno", "Tear"))""".stripMargin)
    conn.close()

    val keys = Seq("DataTurno", "Tear")
    val merge = JdbcUpsertSink.AnsiMergeUpsert()

    // batchSize = 2 forces a mid-partition executeBatch + commit
    val batch1 = Seq(
      ("2024-01-01 A", 1, "P", 100),
      ("2024-01-01 A", 2, "P", 200),
      ("2024-01-01 B", 1, "S", 300)
    ).toDF("DataTurno", "Tear", "Status", "Picks")
    JdbcUpsertSink.write(batch1, "tblLoom", factory, keys, batchSize = 2, dialect = merge)
    assert(query("SELECT * FROM \"tblLoom\" ORDER BY \"DataTurno\", \"Tear\"") === Seq(
      ("2024-01-01 A", 1, "P", 100),
      ("2024-01-01 A", 2, "P", 200),
      ("2024-01-01 B", 1, "S", 300)))

    // overlapping keys update in place (last writer wins), new key inserts
    val batch2 = Seq(
      ("2024-01-01 A", 2, "C", 250),
      ("2024-01-01 B", 2, "P", 400)
    ).toDF("DataTurno", "Tear", "Status", "Picks")
    JdbcUpsertSink.write(batch2, "tblLoom", factory, keys, batchSize = 2, dialect = merge)
    val afterUpsert = Seq(
      ("2024-01-01 A", 1, "P", 100),
      ("2024-01-01 A", 2, "C", 250),
      ("2024-01-01 B", 1, "S", 300),
      ("2024-01-01 B", 2, "P", 400))
    assert(query("SELECT * FROM \"tblLoom\" ORDER BY \"DataTurno\", \"Tear\"") === afterUpsert)

    // replaying the same batch is a no-op (U3 idempotent re-import)
    JdbcUpsertSink.write(batch2, "tblLoom", factory, keys, batchSize = 2, dialect = merge)
    assert(query("SELECT * FROM \"tblLoom\" ORDER BY \"DataTurno\", \"Tear\"") === afterUpsert)
  }

  test("AnsiMergeUpsert statement shape and bind order") {
    val sql = JdbcUpsertSink.AnsiMergeUpsert().sql("t", Seq("k", "a", "b"), Seq("k"))
    assert(sql === "MERGE INTO \"t\" USING SYSIBM.SYSDUMMY1 ON (\"t\".\"k\" = ?) " +
      "WHEN MATCHED THEN UPDATE SET \"a\" = ?, \"b\" = ? " +
      "WHEN NOT MATCHED THEN INSERT (\"k\", \"a\", \"b\") VALUES (?, ?, ?)")
    assert(JdbcUpsertSink.AnsiMergeUpsert().bindOrder(Seq("k", "a", "b"), Seq("k"))
      === Seq(0, 1, 2, 0, 1, 2))
    assert(JdbcUpsertSink.MySqlUpsert.bindOrder(Seq("k", "a", "b"), Seq("k"))
      === Seq(0, 1, 2))
  }
}
