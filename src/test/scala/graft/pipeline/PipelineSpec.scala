package graft.pipeline

import graft.SparkSpec
import graft.ingest.{Dims, LoomCsv, LoomShift}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("JdbcUpsertSink.upsertSql builds a MariaDB batched upsert") {
    val sql = JdbcUpsertSink.upsertSql("tblDadosTeares",
      Seq("DataTurno", "Tear", "Rpm"), Seq("DataTurno", "Tear"))
    assert(sql === "INSERT INTO `tblDadosTeares` (`DataTurno`, `Tear`, `Rpm`) " +
      "VALUES (?, ?, ?) ON DUPLICATE KEY UPDATE `Rpm` = VALUES(`Rpm`)")
  }

  test("Dims.loomDim parses option-line output into (id, name) pairs") {
    val raw = Seq("  101 Tear Norte 1 ", "102 Tear Sul", "not-an-id x", "")
      .toDF("line")
    val out = Dims.loomDim(raw).as[(String, String)].collect().toSet
    assert(out === Set(("101", "Tear Norte 1"), ("102", "Tear Sul")))
  }

  test("Dims.monthDim validates YYYY.MM and lastTwoMonthsPerType picks head-2 desc") {
    val raw = Seq(
      ("shift", "2026.06"), ("shift", "2026.07"), ("shift", "2026.08"),
      ("shift", "2026.08"), ("shift", "garbage"),
      ("operator", "2026.08"), ("history", "2025.01"))
      .toDF("month_type", "month")
    val months = Dims.monthDim(raw)
    assert(months.count() === 5)
    val top = Dims.lastTwoMonthsPerType(months)
      .as[(String, String)].collect().toSet
    assert(top === Set(("shift", "2026.08"), ("shift", "2026.07"),
      ("operator", "2026.08"), ("history", "2025.01")))
  }

  test("Dims.statusLines keeps only monitor/status patterns") {
    val raw = Seq("---> tear 1 ok", "Sucesso: 12", "Valor Incorreto", "noise")
      .toDF("line")
    assert(Dims.statusLines(raw).count() === 3)
  }

  test("EtlPipeline: step ordering, failure abort, and continueOnError") {
    var ran = Vector.empty[String]
    val results = EtlPipeline.run(spark, Seq(
      EtlPipeline.Step("a")(_ => ran :+= "a"),
      EtlPipeline.Step("boom", continueOnError = true)(_ => throw new RuntimeException("x")),
      EtlPipeline.Step("b")(_ => ran :+= "b"),
      EtlPipeline.Step("fatal")(_ => throw new RuntimeException("y")),
      EtlPipeline.Step("never")(_ => ran :+= "never")))
    assert(ran === Vector("a", "b"))
    assert(results.map(r => (r.name, r.ok)) === Seq(("a", true), ("boom", false),
      ("b", true), ("fatal", false), ("never", false)))
  }

  test("ExportJob: month-partitioned write produces the TMSDATA-style layout; verification prunes") {
    val dir = Files.createTempDirectory("export")
    val df = Seq(
      ("2026-07", "daily", "r1"), ("2026-08", "daily", "r2"),
      ("2026-08", "machine", "r3"), ("2026-09", "daily", "r4"))
      .toDF("month", "dataset_type", "payload")
    val out = dir.resolve("out").toString
    ExportJob.exportMonths(df, Seq("2026-07", "2026-08"), out)
    // layout: out/month=2026-07/dataset_type=daily/...
    assert(Files.exists(dir.resolve("out/month=2026-07/dataset_type=daily")))
    assert(!Files.exists(dir.resolve("out/month=2026-09")))
    val verified = ExportJob.verifyExport(spark, out, Seq("2026-07", "2026-08"))
      .as[(String, String, Long)].collect().toSet
    assert(verified === Set(("2026-07", "daily", 1L), ("2026-08", "daily", 1L),
      ("2026-08", "machine", 1L)))
    // partition pruning visible in the plan
    val plan = ExportJob.verifyExport(spark, out, Seq("2026-07"))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("exportMonthsIncremental: dynamic overwrite touches only the exported months") {
    val dir = Files.createTempDirectory("dynexport")
    val out = dir.resolve("out").toString
    val v1 = Seq(("2026-07", "daily", "old7"), ("2026-08", "daily", "old8"))
      .toDF("month", "dataset_type", "payload")
    ExportJob.exportMonths(v1, Seq("2026-07", "2026-08"), out)
    val v2 = Seq(("2026-08", "daily", "new8")).toDF("month", "dataset_type", "payload")
    ExportJob.exportMonthsIncremental(v2, Seq("2026-08"), out)
    val back = spark.read.parquet(out).select("month", "payload")
      .as[(String, String)].collect().toSet
    // 2026-07 untouched, 2026-08 replaced
    assert(back === Set(("2026-07", "old7"), ("2026-08", "new8")))
  }

  test("importOnly end-to-end: CSV tree -> merged parquet, typed view usable") {
    val dir = Files.createTempDirectory("etl")
    val csv = dir.resolve("2026-08/daily"); Files.createDirectories(csv)
    val row = (turno: String, tear: String, ef: String) =>
      (Seq(turno, tear, "ART", "", "G1", "500", ef, "480", "0") ++
        Seq.fill(62)("0")).mkString(",")
    Files.write(csv.resolve("a.csv"), Seq(
      row("2026-08-01.A", "0001", "90"),
      row("2026-08-01.A", "0001", "95"), // same key in one file: one survives
      row("2026-08-01.B", "0002", "80")).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    val out = dir.resolve("out").toString
    val results = EtlPipeline.importOnly(spark, dir.toString, out)
    assert(results.forall(_.ok))
    val merged = spark.read.parquet(out)
    assert(merged.count() === 2)
    val typed = LoomShift.fromTyped(LoomCsv.typedView(merged))
    val shifts = typed.collect().map(s => (s.Tear, s.shift, s.Funcionando)).toSet
    assert(shifts === Set(("0001", "A", 480.0), ("0002", "B", 480.0)))
  }
}
