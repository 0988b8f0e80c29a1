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

  test("VersionedMergeUpsert against live Derby: stale versions skipped, equal replayed, newer applied",
       org.scalatest.tagobjects.Retryable) {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute("DROP TABLE \"serve\"")
    catch { case _: java.sql.SQLException => () }
    conn.createStatement().execute(
      """CREATE TABLE "serve" (
        |  "k" VARCHAR(10) NOT NULL,
        |  "n" INT NOT NULL,
        |  "Status" VARCHAR(10),
        |  "ver" INT,
        |  PRIMARY KEY ("k", "n"))""".stripMargin)
    conn.close()
    val keys = Seq("k", "n")
    val dialect = JdbcUpsertSink.VersionedMergeUpsert("ver")
    def state = query("SELECT \"k\", \"n\", \"Status\", \"ver\" FROM \"serve\" ORDER BY \"k\", \"n\"")

    val v10 = Seq(("a", 1, "up", 10), ("b", 1, "up", 10))
      .toDF("k", "n", "Status", "ver")
    JdbcUpsertSink.write(v10, "serve", factory, keys, batchSize = 2, dialect = dialect)
    assert(state === Seq(("a", 1, "up", 10), ("b", 1, "up", 10)))

    // a STALE write (out-of-order event / replayed old batch) must not
    // regress the advanced row; the unseen key still inserts
    val stale = Seq(("a", 1, "down", 5), ("c", 1, "down", 5))
      .toDF("k", "n", "Status", "ver")
    JdbcUpsertSink.write(stale, "serve", factory, keys, batchSize = 2, dialect = dialect)
    assert(state === Seq(("a", 1, "up", 10), ("b", 1, "up", 10), ("c", 1, "down", 5)))

    // equal-version replay re-applies identical values: idempotent
    JdbcUpsertSink.write(v10, "serve", factory, keys, batchSize = 2, dialect = dialect)
    assert(state === Seq(("a", 1, "up", 10), ("b", 1, "up", 10), ("c", 1, "down", 5)))

    // a newer version advances
    val v20 = Seq(("a", 1, "idle", 20)).toDF("k", "n", "Status", "ver")
    JdbcUpsertSink.write(v20, "serve", factory, keys, batchSize = 2, dialect = dialect)
    assert(state === Seq(("a", 1, "idle", 20), ("b", 1, "up", 10), ("c", 1, "down", 5)))
  }

  test("versioned dialect statement shapes: MERGE match guard; MySQL assigns the version LAST") {
    val m = JdbcUpsertSink.VersionedMergeUpsert("ver")
    assert(m.sql("t", Seq("k", "a", "ver"), Seq("k")) ===
      "MERGE INTO \"t\" USING SYSIBM.SYSDUMMY1 ON (\"t\".\"k\" = ?) " +
        "WHEN MATCHED AND \"t\".\"ver\" <= ? THEN UPDATE SET \"a\" = ?, \"ver\" = ? " +
        "WHEN NOT MATCHED THEN INSERT (\"k\", \"a\", \"ver\") VALUES (?, ?, ?)")
    assert(m.bindOrder(Seq("k", "a", "ver"), Seq("k")) === Seq(0, 2, 1, 2, 0, 1, 2))
    val my = JdbcUpsertSink.MySqlVersionedUpsert("ver")
    val sql = my.sql("t", Seq("k", "a", "ver"), Seq("k"))
    assert(sql === "INSERT INTO `t` (`k`, `a`, `ver`) VALUES (?, ?, ?) " +
      "ON DUPLICATE KEY UPDATE " +
      "`a` = IF(VALUES(`ver`) >= `ver`, VALUES(`a`), `a`), " +
      "`ver` = IF(VALUES(`ver`) >= `ver`, VALUES(`ver`), `ver`)")
    // the guard's correctness depends on the version assignment being
    // last — left-to-right evaluation would otherwise poison the guards
    assert(sql.indexOf("`a` = IF") < sql.indexOf("`ver` = IF"))
  }

  test("PostgresUpsert statement shape and bind order (ON CONFLICT / EXCLUDED)") {
    val sql = JdbcUpsertSink.PostgresUpsert.sql("t", Seq("k", "n", "a", "b"), Seq("k", "n"))
    assert(sql === "INSERT INTO \"t\" (\"k\", \"n\", \"a\", \"b\") VALUES (?, ?, ?, ?) " +
      "ON CONFLICT (\"k\", \"n\") DO UPDATE SET " +
      "\"a\" = EXCLUDED.\"a\", \"b\" = EXCLUDED.\"b\"")
    assert(JdbcUpsertSink.PostgresUpsert.bindOrder(Seq("k", "n", "a", "b"), Seq("k", "n"))
      === Seq(0, 1, 2, 3))
    // key columns never appear as assignment targets (Postgres rejects
    // updating the conflict target), and the conflict target is the
    // EXPLICIT key list — never the bare ON CONFLICT that silently
    // fires on any unique index
    assert(!sql.contains("\"k\" = EXCLUDED") && !sql.contains("\"n\" = EXCLUDED"))
    assert(sql.contains("ON CONFLICT (\"k\", \"n\")"))
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.PostgresUpsert.sql("t", Seq("k"), Seq("k"))
    }
  }

  test("PostgresVersionedUpsert: the replay guard is ONE WHERE over the stored row") {
    val pg = JdbcUpsertSink.PostgresVersionedUpsert("ver")
    val sql = pg.sql("t", Seq("k", "a", "ver"), Seq("k"))
    assert(sql === "INSERT INTO \"t\" (\"k\", \"a\", \"ver\") VALUES (?, ?, ?) " +
      "ON CONFLICT (\"k\") DO UPDATE SET " +
      "\"a\" = EXCLUDED.\"a\", \"ver\" = EXCLUDED.\"ver\" " +
      "WHERE \"t\".\"ver\" <= EXCLUDED.\"ver\"")
    assert(pg.bindOrder(Seq("k", "a", "ver"), Seq("k")) === Seq(0, 1, 2))
    // unlike the MySQL arm there is no assignment-order trap: the WHERE
    // evaluates against the STORED row before any assignment, so the
    // version column needs no last-position treatment — pin that the
    // guard is a statement-level WHERE, not per-column IFs
    assert(sql.split("WHERE").length === 2)
    assert(!sql.contains("IF("))
    intercept[IllegalArgumentException] {
      pg.sql("t", Seq("k", "a", "ver"), Seq("ver"))
    }
  }
}
