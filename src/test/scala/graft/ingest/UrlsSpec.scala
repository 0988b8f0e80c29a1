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

  test("percent-decode: unreserved octets decode (case-insensitive hex), reserved/malformed stay") {
    // %4F='O' (upper hex), %6f='o' (lower hex), %61='a', %7E='~', %2E='.'
    assert(c("http://d%4Fcs.example.%6frg/%61/~x") ===
      Some("http://docs.example.org/a/~x"))
    assert(c("http://a.com/%7Euser") === Some("http://a.com/~user"))
    // reserved octets stay byte-exact: %2F is NOT '/', %3F is not '?'
    assert(c("http://a.com/p?z=a%2Fb&q=%3F") ===
      Some("http://a.com/p?q=%3F&z=a%2Fb"))
    // malformed escapes pass through literally
    assert(c("http://a.com/p?x=100%25off&y=50%zz&z=end%4") ===
      Some("http://a.com/p?x=100%25off&y=50%zz&z=end%4"))
    // %%41: first % is malformed (kept), %41 decodes to A
    assert(c("http://a.com/p%%41") === Some("http://a.com/p%A"))
    // decode happens in the host too, then case-folds
    assert(c("http://%57%57%57.a.com/p") === Some("http://a.com/p"))
  }

  test("dot segments resolve per RFC 3986 §5.2.4") {
    assert(c("http://a.com/x/./y") === Some("http://a.com/x/y"))
    assert(c("http://a.com/x/././y") === Some("http://a.com/x/y"))
    assert(c("http://a.com/x/../y") === Some("http://a.com/y"))
    // sequential pops, one nesting level each side
    assert(c("http://a.com/a/../b/../c") === Some("http://a.com/c"))
    // nested pops need multiple passes
    assert(c("http://a.com/b/c/../../x") === Some("http://a.com/x"))
    // leading underflow clamps at the root, any count
    assert(c("http://a.com/../../../x") === Some("http://a.com/x"))
    // trailing '..' pops then the trailing slash strips
    assert(c("http://a.com/x/y/..") === Some("http://a.com/x"))
    assert(c("http://a.com/x/.") === Some("http://a.com/x"))
    assert(c("http://a.com/..") === Some("http://a.com/"))
    // '...' and '.hidden' and '..x' are ORDINARY segments
    assert(c("http://a.com/.../x") === Some("http://a.com/.../x"))
    assert(c("http://a.com/.hidden/..x") === Some("http://a.com/.hidden/..x"))
    // escapes decode INTO dot segments that then resolve
    assert(c("http://a.com/a/%2E%2E/b/%2E/c") === Some("http://a.com/b/c"))
    // // collapse feeds resolution: '/a//../b' → '/a/../b' → '/b'
    assert(c("http://a.com/a//../b") === Some("http://a.com/b"))
  }

  test("dot-segment nesting beyond depth 16 rejects; exactly 16 resolves") {
    val segs16 = (1 to 16).map(i => s"s$i").mkString("/")
    assert(c(s"http://a.com/$segs16${"/.." * 16}") === Some("http://a.com/"))
    val segs17 = (1 to 17).map(i => s"s$i").mkString("/")
    val (cu, h, s) = canon(s"http://a.com/$segs17${"/.." * 17}")
    assert(cu.isEmpty && h.isEmpty && s.isEmpty)
  }

  test("port validity: 0..65535 accepted, out-of-range and overflow-length reject all three columns") {
    assert(c("http://a.com:65535/x") === Some("http://a.com:65535/x"))
    assert(c("http://a.com:065535/x") === Some("http://a.com:65535/x"))
    assert(c("http://a.com:0/x") === Some("http://a.com:0/x"))
    assert(c("http://a.com:000080/x") === Some("http://a.com/x"))
    Seq("http://a.com:65536/x",
        "http://a.com:99999999999999999999999/x").foreach { u =>
      val (cu, h, s) = canon(u)
      assert(cu.isEmpty && h.isEmpty && s.isEmpty, u)
    }
  }

  private lazy val psl =
    Urls.loadPsl(spark, "fixtures/psl/psl.dat")

  private def pslSite(host: String): String =
    Urls.withPslSite(Seq((1L, host)).toDF("id", "host"), "host", psl)
      .select("url_site_psl").as[String].collect().head

  test("PSL site: registrable domain = longest matching suffix + 1 label") {
    // the verdict's done-criterion: a.co.uk and b.co.uk are DIFFERENT sites
    assert(pslSite("a.co.uk") === "a.co.uk")
    assert(pslSite("b.co.uk") === "b.co.uk")
    assert(pslSite("www.deep.a.co.uk") === "a.co.uk")
    // longest rule wins over the shorter one ('co.uk' beats 'uk')
    assert(pslSite("x.uk") === "x.uk")
    assert(pslSite("t.com.br") === "t.com.br")
    assert(pslSite("sub.t.com.br") === "t.com.br")
    assert(pslSite("news.example.com") === "example.com")
  }

  test("PSL site: wildcard and exception rules") {
    // *.ck: z.ck is itself a public suffix → shop.z.ck is the site
    assert(pslSite("shop.z.ck") === "shop.z.ck")
    assert(pslSite("deep.shop.z.ck") === "shop.z.ck")
    // !www.ck overrides the wildcard: www.ck IS a registrable domain
    assert(pslSite("www.ck") === "www.ck")
    assert(pslSite("sub.www.ck") === "www.ck")
  }

  test("PSL site: implicit-* for unlisted TLDs; suffix-only and dotless hosts fall back to themselves") {
    assert(pslSite("q.test") === "q.test")
    assert(pslSite("deep.q.test") === "q.test")
    // a host that IS a public suffix has no registrable domain
    assert(pslSite("co.uk") === "co.uk")
    assert(pslSite("com") === "com")
    assert(pslSite("localhost") === "localhost")
  }

  test("canonicalization is idempotent on its own output") {
    val messy = Seq(
      "HTTP://WWW.A.COM:80//x/?b=2&utm_source=f&a=1#z",
      "https://u@B.com.:0443/p/",
      "http://a.com/p?gclid&x=1",
      // decoded outputs keep only reserved escapes — second pass is a no-op
      "http://d%4Fcs.a.com/%61/b/../c?z=a%2Fb&t=v%61l",
      "http://a.com/../x/./y/z/..")
    messy.foreach { u =>
      val once = c(u).get
      assert(c(once) === Some(once), u)
    }
  }
}
