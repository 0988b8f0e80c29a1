package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** S10 (log ring + txt export) and S12 (debug HTML snapshot) — the two
  * previously-declared non-goal sinks, now implemented in their
  * engine-shaped form. */
class RunLogSpec extends SparkSpec {
  import spark.implicits._

  test("RunLog keeps only the newest `capacity` entries (reference ring)") {
    val log = new RunLog(capacity = 3)
    (1 to 5).foreach(i => log.add(s"m$i"))
    assert(log.entries.map(_.message) === Seq("m3", "m4", "m5"))
  }

  test("saveTo writes the reference's [HH:MM:SS] icon message line shape") {
    val log = new RunLog()
    log.add("import done", "success", epochMs = 45296000L) // 12:34:56 UTC
    log.add("late file", "warning", epochMs = 45296000L)
    log.add("plain note", epochMs = 45296000L)
    val path = Files.createTempDirectory("runlog").resolve("log.txt").toString
    log.saveTo(path)
    val lines = Files.readAllLines(Paths.get(path))
    assert(lines.get(0) === "[12:34:56] ✅ import done")
    assert(lines.get(1) === "[12:34:56] ⚠️ late file")
    assert(lines.get(2) === "[12:34:56] ℹ️ plain note")
  }

  test("runLogged records one success/error entry per pipeline step") {
    val log = new RunLog()
    val results = EtlPipeline.runLogged(spark, Seq(
      EtlPipeline.Step("ok-step")(_ => ()),
      EtlPipeline.Step("bad-step", continueOnError = true)(_ =>
        throw new RuntimeException("boom")),
      EtlPipeline.Step("after")(_ => ())), log)
    assert(results.map(_.ok) === Seq(true, false, true))
    val msgs = log.entries.map(e => (e.level, e.message))
    assert(msgs.count(_._1 == "success") === 2)
    assert(msgs.exists { case (l, m) => l == "error" && m.contains("boom") })
  }

  test("DebugSnapshot dumps schema + first-n rows as HTML, bounded by limit") {
    val df = (1L to 1000L).map(i => (i, s"name<$i>", if (i == 1) null else "x"))
      .toDF("id", "tag", "maybe")
    val path = Files.createTempDirectory("snap").resolve("snap.html").toString
    DebugSnapshot.dump(df, path, n = 5)
    val html = Files.readString(Paths.get(path))
    assert(html.contains("<th>id</th>") && html.contains("<th>tag</th>"))
    assert(html.contains("name&lt;1&gt;"))  // HTML-escaped cell
    assert(html.contains("∅"))              // null marker
    assert(!html.contains("name&lt;6&gt;")) // bounded at n rows
  }
}
