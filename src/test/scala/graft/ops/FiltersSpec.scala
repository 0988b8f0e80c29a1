package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's predicate edge semantics (FIXTURES.md §B edge rows,
  * reference src/main_01.py:439-458). */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    // (DataTurno, Funcionando, Parado, expected desligado?)
    ("2026-08-01.C", "0", "440", true),    // canonical powered-off row
    ("2026-08-01.C", "0", "399", false),   // Parado below 400 boundary
    ("2026-08-01.C", "0", "400", true),    // boundary: reference tests >= 400
    ("2026-08-01.A", "0", "440", false),   // not the .C shift
    ("2026-08-01.C", "", "440", true),     // float('' or 0) → 0.0
    ("2026-08-01.C", "abc", "440", false), // unparseable → ValueError → False
    ("2026-08-01.C", "0", "abc", false),   // unparseable threshold side
    ("2026-08-01.C", "1", "440", false)    // running
  ).toDF("DataTurno", "Funcionando", "Parado", "expected")

  test("P4: desligado predicate matches reference row-by-row semantics") {
    val out = rows.withColumn("got",
        Filters.poweredOff("DataTurno", "Funcionando", "Parado", 400.0))
      .select("DataTurno", "Funcionando", "Parado", "expected", "got")
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(4) === r.getBoolean(3),
        s"row ${r.getString(0)},${r.getString(1)},${r.getString(2)}")
    }
  }

  test("pyFloatOrZero: '' and null → 0.0; unparseable → null") {
    val df = Seq[Tuple1[String]](Tuple1(""), Tuple1(null), Tuple1("abc"), Tuple1("1.5"))
      .toDF("x").withColumn("v", Filters.pyFloatOrZero("x"))
    val got = df.select("v").collect().map(r => Option(r.get(0)))
    assert(got(0) === Some(0.0) && got(1) === Some(0.0) &&
      got(2) === None && got(3) === Some(1.5))
  }

  test("P10/P11: withinOfMax and olderThanMax partition the data") {
    val df = Seq(1L, 50L, 100L).map(s => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(s * 3600))).toDF("ts")
    val recent = Filters.withinOfMax("ts", "24 HOURS")(df).count()
    val old = Filters.olderThanMax("ts", "24 HOURS")(df).count()
    assert(recent === 1 && old === 2)
  }

  test("nonNullKeys drops rows with any null key") {
    val df = Seq((Some(1), Some(2)), (None, Some(3)), (Some(4), None))
      .toDF("a", "b")
    assert(Filters.nonNullKeys(Seq("a", "b"))(df).count() === 1)
  }
}
