package graft.ingest

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): (Option[String], Option[String], Option[String]) = {
    val row = Urls.withCanonical(Seq((1L, url)).toDF("id", "url"), "url")
      .select("url_canon", "url_host", "url_site")
      .as[(Option[String], Option[String], Option[String])].collect().head
    row
  }
  private def c(url: String): Option[String] = canon(url)._1

  test("the kitchen-sink messy URL folds to its canonical identity") {
    assert(c("HTTP://user:pw@WWW.News.Example.COM.:0080//a//b/" +
      "?utm_source=x&z=1&gclid=9&a=2#frag")
      === Some("http://news.example.com/a/b?a=2&z=1"))
  }

  test("default ports drop per scheme; a real port survives") {
    assert(c("http://a.com:80/x") === Some("http://a.com/x"))
    assert(c("https://a.com:443/x") === Some("https://a.com/x"))
    // the OTHER scheme's default is a real port
    assert(c("http://a.com:443/x") === Some("http://a.com:443/x"))
    assert(c("https://a.com:80/x") === Some("https://a.com:80/x"))
    assert(c("http://a.com:8080/x") === Some("http://a.com:8080/x"))
    // leading zeros fold through the integer cast
    assert(c("https://a.com:0443/x") === Some("https://a.com/x"))
  }

  test("host folding: case, www., trailing root-dot, userinfo — in the right order") {
    assert(c("http://WWW.A.COM/") === Some("http://a.com/"))
    // root-dot strips BEFORE www. (www.a.com. would otherwise keep the www)
    assert(c("http://www.a.com./p") === Some("http://a.com/p"))
    assert(c("http://u@a.com/p") === Some("http://a.com/p"))
    // www is only folded as a LABEL prefix — wwwx.com keeps its name
    assert(c("http://wwwx.com/p") === Some("http://wwwx.com/p"))
  }

  test("path normalization: empty → /, duplicate slashes, trailing slash (root keeps its)") {
    assert(c("http://a.com") === Some("http://a.com/"))
    assert(c("http://a.com/") === Some("http://a.com/"))
    assert(c("http://a.com//x///y//") === Some("http://a.com/x/y"))
    assert(c("http://a.com/x/") === Some("http://a.com/x"))
  }

  test("query: tracking params drop, survivors sort, emptied query drops its ?") {
    assert(c("http://a.com/p?b=2&a=1") === Some("http://a.com/p?a=1&b=2"))
    assert(c("http://a.com/p?utm_campaign=x&id=7&fbclid=z&msclkid=1&yclid=2&ref=h&ref_src=t")
      === Some("http://a.com/p?id=7"))
    assert(c("http://a.com/p?utm_source=feed&gclid=1") === Some("http://a.com/p"))
    // bare tracking key (no =v) drops too; empty pairs (&&) drop
    assert(c("http://a.com/p?gclid&&x=1") === Some("http://a.com/p?x=1"))
    // param names are case-sensitive: UTM_SOURCE is conservatively kept
    assert(c("http://a.com/p?UTM_SOURCE=x") === Some("http://a.com/p?UTM_SOURCE=x"))
    // a non-tracking param that merely CONTAINS a tracking name is kept
    assert(c("http://a.com/p?xgclid=1&refx=2")
      === Some("http://a.com/p?refx=2&xgclid=1"))
  }

  test("fragment always drops") {
    assert(c("http://a.com/p#sec") === Some("http://a.com/p"))
    assert(c("http://a.com/p?a=1#sec") === Some("http://a.com/p?a=1"))
  }

  test("non-http(s), relative, and hostless URLs reject to NULL — all three columns") {
    Seq("/relative/path?id=1", "ftp://a.com/x", "mailto:x@a.com",
      "javascript:void(0)", "http:///nohost", "not a url at all")
      .foreach { u =>
        val (cu, h, s) = canon(u)
        assert(cu.isEmpty && h.isEmpty && s.isEmpty, u)
      }
  }

  test("host and site columns: site is the last two labels; a dotless host is its own site") {
    assert(canon("http://sub.deep.news.example.com/p")._2
      === Some("sub.deep.news.example.com"))
    assert(canon("http://sub.deep.news.example.com/p")._3
      === Some("example.com"))
    assert(canon("http://localhost:9000/p")._3 === Some("localhost"))
  }

  test("canonicalization is idempotent on its own output") {
    val messy = Seq(
      "HTTP://WWW.A.COM:80//x/?b=2&utm_source=f&a=1#z",
      "https://u@B.com.:0443/p/",
      "http://a.com/p?gclid&x=1")
    messy.foreach { u =>
      val once = c(u).get
      assert(c(once) === Some(once), u)
    }
  }
}
