package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter

/** S10 — the reference's log sink re-expressed without the GUI: the Flet
  * app keeps a scrolling in-memory log capped at the last 100 entries
  * (reference src/main_01.py:918-959, ring truncation :955-957) and a
  * save-to-txt export writing `[HH:MM:SS] icon message` lines
  * (src/main_01.py:1062-1076). Here that is a bounded in-memory ring of
  * typed entries plus the same line-shaped text export — driver-side
  * bookkeeping about the RUN, deliberately not a Spark job: log volume
  * is O(steps), and the engine's per-task logging already belongs to
  * Spark's own event log. [[EtlPipeline.runLogged]] feeds one entry per
  * step result.
  */
final class RunLog(capacity: Int = 100) {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  final case class Entry(epochMs: Long, level: String, message: String)

  /** The reference's per-level icon (colors are GUI-only). */
  private val icons = Map("success" -> "✅", "error" -> "❌",
    "warning" -> "⚠️", "debug" -> "🔍")
  private val defaultIcon = "ℹ️"

  private val ring = new java.util.ArrayDeque[Entry](capacity)

  /** Append an entry; the ring keeps only the newest `capacity` entries
    * (reference src/main_01.py:955-957). */
  def add(message: String, level: String = "info",
          epochMs: Long = System.currentTimeMillis()): Unit = synchronized {
    if (ring.size == capacity) ring.pollFirst()
    ring.addLast(Entry(epochMs, level, message))
  }

  def entries: Seq[Entry] = synchronized {
    ring.toArray(Array.empty[Entry]).toSeq
  }

  /** Render one entry in the reference's saved-log line shape:
    * `[HH:MM:SS] <icon> <message>`. */
  def formatLine(e: Entry): String = {
    val hms = java.time.Instant.ofEpochMilli(e.epochMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalTime
      .format(DateTimeFormatter.ofPattern("HH:mm:ss"))
    s"[$hms] ${icons.getOrElse(e.level, defaultIcon)} ${e.message}"
  }

  /** `save_logs` (src/main_01.py:1062-1076): write the retained entries
    * as text, newest last. Returns the written path. */
  def saveTo(path: String): String = {
    val text = entries.map(formatLine).mkString("", "\n", "\n")
    Files.write(Paths.get(path), text.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    path
  }
}

/** S12 — the reference's debug snapshot sink: on an unexpected export
  * response it dumps the raw payload to an `.html` file for offline
  * inspection (reference src/main_02.py:367-370, src/main_03.py:80-83).
  * The engine analogue snapshots a DATAFRAME instead of an HTTP body:
  * schema + the first `n` rows as a static HTML table. Bounded by
  * construction — `limit(n)` plans as CollectLimit, so the snapshot
  * never scans more than one partition-ish of data no matter how large
  * the frame is; this is a debug aid, not a data sink.
  */
object DebugSnapshot {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Write schema + first `n` rows of `df` as an HTML file; returns the
    * path. Null cells render as `∅` to be distinguishable from the
    * string "null". */
  def dump(df: org.apache.spark.sql.DataFrame, path: String, n: Int = 20): String = {
    val cols = df.columns
    val rows = df.limit(n).collect()
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>")
    sb.append("<title>graft debug snapshot</title></head><body>")
    sb.append(s"<p>${esc(df.schema.treeString)}</p>".replace("\n", "<br/>"))
    sb.append("<table border=\"1\"><tr>")
    cols.foreach(c => sb.append(s"<th>${esc(c)}</th>"))
    sb.append("</tr>")
    rows.foreach { r =>
      sb.append("<tr>")
      cols.indices.foreach { i =>
        val cell = if (r.isNullAt(i)) "∅" else esc(String.valueOf(r.get(i)))
        sb.append(s"<td>$cell</td>")
      }
      sb.append("</tr>")
    }
    sb.append("</table></body></html>")
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    path
  }
}
