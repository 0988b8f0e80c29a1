package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side identity step BEFORE
  * URL-grain dedup: a frontier fetches `HTTP://WWW.Site.COM:80/a//b/?
  * utm_source=x&id=7#frag` and `http://site.com/a/b?id=7` and gets the
  * same bytes, so a corpus keyed on raw URL double-counts every page
  * and a per-site quota (q84/q104/q187's source-grain machinery) is
  * keyed on noise. The reference ingests from fixed CGI endpoints
  * (reference src/main_03.py:114-209 builds its URLs from config), so
  * it never needed this; a web-scale corpus does, and every published
  * crawl pipeline canonicalizes before dedup.
  *
  * Everything is pure Catalyst string/regexp expressions — no UDF, no
  * java.net.URI (whose parser is a JVM-only behavior an oracle engine
  * cannot reproduce): one scan-side projection, zero shuffles, and
  * every regex is in the RE2-compatible subset (no backreferences) so
  * DuckDB can run the byte-identical patterns.
  *
  * Canonical form (for http/https absolute URLs; anything else maps to
  * NULL — reject is an explicit, visible outcome, not a passthrough
  * that would silently key dedup on garbage):
  *  - scheme and host lowercased; userinfo (`user:pw@`) dropped — it
  *    is never part of page identity;
  *  - host: trailing root-dot dropped (`site.com.` ≡ `site.com`), then
  *    a leading `www.` dropped (the standard crawl alias fold);
  *  - port: leading zeros normalized via integer cast, then dropped
  *    when it is the scheme default (http:80, https:443) — a real
  *    `:8080` survives;
  *  - path: duplicate slashes collapsed, trailing slash dropped
  *    (except the root path), empty path becomes `/`. Dot-segment
  *    resolution (`/a/../b`) is deliberately OUT of scope: it is
  *    iterative (a fixed regex-pass count is wrong on adversarial
  *    depth) and fetchers resolve it before the URL ever lands in a
  *    corpus; this operator canonicalizes STORED identities.
  *    Percent-encoding is likewise left byte-exact: un-escaping can
  *    change identity (`%2F` is not `/`), so touching it is unsafe
  *    without the fetcher's cooperation.
  *  - query: split on `&`, empty pairs and tracking parameters dropped
  *    ([[trackingParamRe]]: `utm_*`, `gclid`, `fbclid`, `msclkid`,
  *    `yclid`, `ref`, `ref_src` — the conventional lowercase spellings;
  *    parameter names are case-sensitive per RFC 3986, so `UTM_SOURCE`
  *    is conservatively KEPT), survivors byte-order sorted (`sort_array`
  *    ↔ DuckDB `list_sort`, identical on the ASCII `k=v` domain) so
  *    param order never splits identity; an emptied query drops its
  *    `?`; the fragment never reaches the server and is always dropped.
  *
  * Also emitted: `url_host` (canonical host — the per-host quota key)
  * and `url_site` (last two host labels — the registrable-domain
  * APPROXIMATION; the honest form needs the Public Suffix List, which
  * is reference data, not engine logic: a deployment joins it in as a
  * broadcast dim and this column is the fallback when it is absent;
  * a dotless host is its own site).
  *
  * Scale: per-row independent string work — the canonical map pass.
  * The single interpreted higher-order function (the param `filter`)
  * runs over ≤ a dozen elements per row and is materialized once in
  * its own projection (interpreted lambdas are not CSE'd —
  * BENCHNOTES' q202 lesson); everything else is codegen'd.
  */
object Urls {

  /** Tracking parameters dropped from canonical queries: matched
    * against the full `k=v` pair (or bare `k`) — `^name(=…)?$`. */
  val trackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|yclid|ref|ref_src)(=.*)?$"

  /** Adds `url_canon`, `url_host`, `url_site` derived from `urlCol`.
    * NULL in all three marks a non-http(s)/relative/unparseable URL. */
  def withCanonical(df: DataFrame, urlCol: String): DataFrame = {
    val url = col(urlCol)
    val parsed = df
      .withColumn("__sch",
        lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("__auth",
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
      .withColumn("__rawpath",
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("__rawq", regexp_extract(url, "^[^?#]*\\?([^#]*)", 1))
      // authority → host/port: userinfo off, port split, case folded,
      // root-dot then www. folded (that order: `www.a.com.` → `a.com`)
      .withColumn("__hp", regexp_replace(col("__auth"), "^[^@]*@", ""))
      .withColumn("__portraw",
        regexp_extract(col("__hp"), ":([0-9]+)$", 1))
      .withColumn("__host",
        regexp_replace(
          regexp_replace(
            lower(regexp_replace(col("__hp"), ":[0-9]+$", "")),
            "\\.$", ""),
          "^www\\.", ""))
      // port: leading-zero fold through BIGINT, scheme defaults dropped
      .withColumn("__port",
        when(col("__portraw") === "", lit(""))
          .otherwise(col("__portraw").cast("bigint").cast("string")))
      .withColumn("__portpart",
        when(col("__port") === "" ||
             (col("__sch") === "http" && col("__port") === "80") ||
             (col("__sch") === "https" && col("__port") === "443"),
          lit("")).otherwise(concat(lit(":"), col("__port"))))
      // path: collapse //, strip trailing / (root keeps its slash)
      .withColumn("__path0",
        regexp_replace(col("__rawpath"), "/{2,}", "/"))
      .withColumn("__path",
        when(col("__path0") === "", lit("/"))
          .when(col("__path0") =!= "/" && col("__path0").endsWith("/"),
            expr("substring(__path0, 1, length(__path0) - 1)"))
          .otherwise(col("__path0")))
      // query params: the one interpreted lambda — materialized once
      .withColumn("__params",
        filter(split(col("__rawq"), "&"),
          x => x =!= "" && !x.rlike(trackingParamRe)))
    parsed
      .withColumn("__q", array_join(sort_array(col("__params")), "&"))
      .withColumn("__ok",
        (col("__sch") === "http" || col("__sch") === "https") &&
          col("__host") =!= "")
      .withColumn("url_canon",
        when(col("__ok"), concat(
          col("__sch"), lit("://"), col("__host"), col("__portpart"),
          col("__path"),
          when(col("__q") === "", lit(""))
            .otherwise(concat(lit("?"), col("__q"))))))
      .withColumn("url_host", when(col("__ok"), col("__host")))
      .withColumn("url_site",
        when(col("__ok"),
          when(regexp_extract(col("__host"), "([^.]+\\.[^.]+)$", 1) === "",
            col("__host"))
            .otherwise(regexp_extract(col("__host"), "([^.]+\\.[^.]+)$", 1))))
      .drop("__sch", "__auth", "__rawpath", "__rawq", "__hp", "__portraw",
        "__host", "__port", "__portpart", "__path0", "__path", "__params",
        "__q", "__ok")
  }
}
