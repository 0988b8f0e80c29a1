package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minChars: Int = 25,
                      maxLinkBp: Long = 3333): (Long, Long, String) = {
    val out = HtmlExtract.mainContent("id", "html", minChars, maxLinkBp)(
      Seq((1L, html)).toDF("id", "html"))
      .select("n_segments", "n_kept", "main_text")
      .as[(Long, Long, String)].collect().head
    out
  }

  test("committed fixture: a boilerplate-heavy page yields only its article text") {
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/html/article.html")), "UTF-8")
    val (nSeg, nKept, main) = extract(html)
    // visible segments: 5 nav items, "Popular posts" + 3 sidebar links,
    // h1 + three paragraphs, 1 footer line = 14; survivors = the
    // article's h1 + 3 paragraphs
    assert(nSeg === 14L, (nSeg, main))
    assert(nKept === 4L, (nKept, main))
    // the article text is all there, whitespace-collapsed
    assert(main.startsWith("Reed wear and shed timing on older looms"))
    Seq("worn reed shows up first in the selvedge",
        "no tension adjustment will cure",
        "weft-stop frequency with no matching rise in warp stops",
        "drops back to its baseline within a shift")
      .foreach(s => assert(main.contains(s), s))
    // entities decoded: &amp; and &#39;
    assert(main.contains("both the dents & the yarn"))
    assert(main.contains("re-check pick density 'on the cloth' rather"))
    // none of the chrome survives: nav, sidebar, footer, head, script
    Seq("Home", "Weaving", "Popular posts", "warp tension tricks",
        "Contact", "Privacy", "font-family", "tracker", "not real content")
      .foreach(s => assert(!main.contains(s), s))
  }

  test("script/style/head/comment content is void — even fake closing tags inside strings") {
    val (nSeg, _, main) = extract(
      "<html><head><title>A long enough title that would pass minChars</title>" +
        "</head><body><script>var x = \"</p><p>injected segment text here</p>\";" +
        "</script><!-- <p>commented out paragraph nobody should see</p> -->" +
        "<p>the one real paragraph of this page, long enough to keep</p></body></html>")
    assert(nSeg === 1L, (nSeg, main))
    assert(main === "the one real paragraph of this page, long enough to keep")
  }

  test("entity decoding: &amp; decodes LAST, so &amp;lt; yields the literal &lt;") {
    val got = Seq("x").toDF("x")
      .select(HtmlExtract.visibleText(
        lit("&amp;lt; &lt; &gt; &quot; &#39; a&nbsp;b")).as("v"))
      .as[String].collect().head
    assert(got === "&lt; < > \" ' a b")
  }

  test("escape/decode round trip: renderer-escaped text extracts back to its original bytes") {
    // q205's synthesis contract: & -> &amp; first, then < -> &lt;
    // (what a real renderer emits); visibleText must invert it exactly,
    // including text that already CONTAINS entity spellings
    Seq("a < b & c", "keep &amp; raw", "tag<b>not-a-tag", "x &lt; y")
      .foreach { orig =>
        val escaped = orig.replace("&", "&amp;").replace("<", "&lt;")
        val got = Seq("x").toDF("x")
          .select(HtmlExtract.visibleText(lit(escaped)).as("v"))
          .as[String].collect().head
        assert(got === orig, escaped)
      }
  }

  test("link-density boundary: kept at exactly maxLinkBp, dropped one char past") {
    // txt = 30 chars, anchor text 15 of them, maxLinkBp = 5000:
    // 15*10^4 == 5000*30 — the <= rule keeps the boundary segment
    val at15 = "123456789012345"
    val keep = extract(s"<p><a href='/x'>$at15</a> abcdefghijklmn</p>",
      minChars = 5, maxLinkBp = 5000L)
    assert(keep._3.length === 30, keep)
    assert(keep._2 === 1L, keep)
    // 16 anchor chars of 31: 16*10^4 > 5000*31 — dropped
    val at16 = "1234567890123456"
    val drop = extract(s"<p><a href='/x'>$at16</a> abcdefghijklmn</p>",
      minChars = 5, maxLinkBp = 5000L)
    assert(drop._1 === 1L && drop._2 === 0L && drop._3 === "", drop)
  }

  test("minChars boundary: a segment of exactly minChars survives, one shorter does not") {
    val s25 = "a" * 25
    assert(extract(s"<p>$s25</p>")._2 === 1L)
    assert(extract(s"<p>${"a" * 24}</p>")._2 === 0L)
  }

  test("inline markup stays within its segment; block tags split") {
    val (nSeg, nKept, main) = extract(
      "<div>first block with <b>bold</b> and <span>span text</span> kept whole</div>" +
        "<div>second block also long enough to survive the cut</div>",
      minChars = 10)
    assert(nSeg === 2L && nKept === 2L)
    assert(main ===
      "first block with bold and span text kept whole " +
        "second block also long enough to survive the cut")
  }

  test("header/footer/nav drop by density even when long; plain text of equal length survives") {
    val links = (1 to 6).map(i =>
      s"<a href='/$i'>a reasonably long navigation label number $i</a>")
      .mkString(" | ")
    val plain = "c" * 260
    val (_, nKept, main) = extract(
      s"<nav>$links</nav><p>$plain</p>", minChars = 100)
    assert(nKept === 1L)
    assert(main === plain)
  }
}
