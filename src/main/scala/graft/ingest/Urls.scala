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
  * every regex is in the RE2-compatible subset (no backreferences, no
  * lookaround) so DuckDB can run the byte-identical patterns.
  *
  * Canonical form (for http/https absolute URLs; anything else maps to
  * NULL — reject is an explicit, visible outcome, not a passthrough
  * that would silently key dedup on garbage):
  *  - percent-escapes of UNRESERVED octets (RFC 3986 §2.3: ALPHA /
  *    DIGIT / `-` `.` `_` `~`) are decoded FIRST, over the whole URL,
  *    with case-insensitive hex (`%4F` ≡ `%4f` → `O`) — §6.2.2.2 says
  *    these never change identity, so `http://a/%7Ex` ≡ `http://a/~x`.
  *    Escapes of RESERVED octets stay byte-exact (`%2F` is NOT `/`;
  *    decoding it would change identity) and malformed escapes
  *    (`%zz`, trailing `%`) pass through literally. Decoding before
  *    parse is safe because no unreserved octet is a delimiter
  *    (`/ ? # @ : &` are all reserved);
  *  - scheme and host lowercased; userinfo (`user:pw@`) dropped — it
  *    is never part of page identity;
  *  - host: trailing root-dot dropped (`site.com.` ≡ `site.com`), then
  *    a leading `www.` dropped (the standard crawl alias fold);
  *  - port: leading zeros folded (regex, not cast — engine-neutral),
  *    then dropped when it is the scheme default (http:80, https:443)
  *    — a real `:8080` survives. A port OUTSIDE 0..65535 (`:65536`, or
  *    an adversarial 20-digit string that would overflow any integer
  *    cast) makes the URL invalid, and the whole row REJECTS to NULL
  *    in all three output columns — never a silently-dropped port;
  *  - path: duplicate slashes collapsed, then dot segments resolved
  *    per RFC 3986 §5.2.4 ([[resolveDotSegments]]): `/./` removed
  *    (one global pass handles any run), `seg/../` popped (one global
  *    regexp pass per NESTING level, [[dotSegmentDepth]] = 16 passes —
  *    sequential non-nested pops all fall in one pass via leftmost
  *    scan continuation), leading `/../` underflow clamps to `/` (one
  *    anchored pass handles any count). A path still holding a `..`
  *    segment after the passes (nesting deeper than 16 — adversarial,
  *    never organic) REJECTS to NULL rather than emitting a
  *    non-canonical identity; this also keeps the canonicalizer
  *    idempotent on every non-NULL output. Then trailing slash
  *    dropped (except the root path), empty path becomes `/`;
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
  * FALLBACK; the honest form is the Public Suffix List, which is
  * reference DATA, not engine logic: [[loadPsl]] + [[withPslSite]]
  * join it in as a broadcast dim when a deployment supplies it, and
  * this column remains the no-table fallback; a dotless host is its
  * own site).
  *
  * Scale: per-row independent string work — the canonical map pass.
  * Two interpreted higher-order functions (the percent-decode
  * `transform` and the param `filter`), each materialized once in its
  * own projection (interpreted lambdas are not CSE'd — BENCHNOTES'
  * q202 lesson) and each over ≤ a dozen elements per row; the
  * dot-segment fold is 18 codegen'd regexp passes over a short path
  * string; everything else is codegen'd.
  */
object Urls {

  /** Tracking parameters dropped from canonical queries: matched
    * against the full `k=v` pair (or bare `k`) — `^name(=…)?$`. */
  val trackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|yclid|ref|ref_src)(=.*)?$"

  /** Lowercased two-hex-digit codes of the RFC 3986 unreserved octets:
    * 2d `-`, 2e `.`, 30-39 digits, 41-5a A-Z, 5f `_`, 61-7a a-z, 7e
    * `~`. A `%XX` escape whose lowercased hex matches decodes; every
    * other escape (reserved or malformed) stays byte-exact. */
  val unresHexRe: String =
    "^(2[de]|3[0-9]|4[1-9a-f]|5[0-9a]|5f|6[1-9a-f]|7[0-9a]|7e)$"

  /** `/./` run removal — `(/\.)+` eats any consecutive run, so ONE
    * global pass clears every single-dot segment. */
  val singleDotRe: String = "(/\\.)+(/|$)"

  /** One `seg/../` pop: seg is any segment that is not `.` (already
    * removed) and not `..` (must not pop a pop) — the alternation
    * enumerates exactly those without lookaround (RE2-safe). One
    * global pass per NESTING level; sequential pops chain within a
    * pass because the scan continues after each replacement. */
  val popSegmentRe: String =
    "/(\\.[^./][^/]*|\\.\\.[^/]+|[^/.][^/]*)/\\.\\.(/|$)"

  /** Leading `/../` underflow → `/` (RFC 3986 §5.2.4 step 2C at the
    * root): anchored `+` clears any count in one pass. */
  val underflowRe: String = "^(/\\.\\.)+(/|$)"

  /** Residual-`..` detector: any match after [[resolveDotSegments]]
    * means nesting exceeded [[dotSegmentDepth]] → the URL rejects. */
  val residualDotRe: String = "/\\.\\.(/|$)"

  /** Pop passes in [[resolveDotSegments]] — bounds the NESTING depth
    * (`a/b/../..` = 2) that resolves; deeper paths reject. Organic
    * crawl paths nest 0–2 deep; 16 is adversarial-proof headroom. */
  val dotSegmentDepth: Int = 16

  /** Decodes `%XX` escapes of unreserved octets ([[unresHexRe]]),
    * case-insensitive hex, leaving reserved and malformed escapes
    * byte-exact: split on `%`, map each fragment's 2-hex prefix
    * through one interpreted `transform`, rejoin. NULL-propagating. */
  def percentDecodeUnreserved(c: Column): Column = {
    val parts = split(c, "%", -1)
    val tail = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val dec = transform(tail, x => {
      val hx = lower(substring(x, 1, 2))
      val code = conv(hx, 16, 10).cast("int")
      when(hx.rlike(unresHexRe),
        concat(call_function("char", code), x.substr(lit(3), length(x))))
        .otherwise(concat(lit("%"), x))
    })
    concat(element_at(parts, 1), array_join(dec, ""))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments on an absolute path (`''` or
    * `/...`), as a bounded fold of global regexp passes — see the
    * object scaladoc for the per-pattern reasoning. Deeper-than-depth
    * nesting leaves a `..` segment behind; callers detect it with
    * [[residualDotRe]] and reject. */
  def resolveDotSegments(p: Column, depth: Int = dotSegmentDepth): Column = {
    val p1 = regexp_replace(p, singleDotRe, "/")
    val popped = (1 to depth).foldLeft(p1)((c, _) =>
      regexp_replace(c, popSegmentRe, "/"))
    regexp_replace(popped, underflowRe, "/")
  }

  /** Adds `url_canon`, `url_host`, `url_site` derived from `urlCol`.
    * NULL in all three marks a non-http(s)/relative/unparseable URL,
    * an out-of-range port, or unresolvable (depth>16) dot nesting. */
  def withCanonical(df: DataFrame, urlCol: String): DataFrame = {
    val parsed = df
      // RFC 3986 §6.2.2.2 first: unreserved-octet escapes decode over
      // the WHOLE url (no unreserved octet is a delimiter, so parse
      // boundaries are unaffected; decoded dots DO become dot
      // segments, which is why decode precedes resolution)
      .withColumn("__u", percentDecodeUnreserved(col(urlCol)))
      .withColumn("__sch",
        lower(regexp_extract(col("__u"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("__auth",
        regexp_extract(col("__u"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
      .withColumn("__rawpath",
        regexp_extract(col("__u"), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("__rawq", regexp_extract(col("__u"), "^[^?#]*\\?([^#]*)", 1))
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
      // port: leading-zero fold by regex (cast-free — an adversarial
      // 20-digit port must flow into the VALIDITY check, not overflow
      // an engine cast); out-of-range ports reject the whole URL
      .withColumn("__pz", regexp_replace(col("__portraw"), "^0+", ""))
      .withColumn("__port",
        when(col("__portraw") === "", lit(""))
          .when(col("__pz") === "", lit("0"))
          .otherwise(col("__pz")))
      // try_cast: the length guard already rules out overflow, but a
      // plain cast would still throw at CONSTANT-FOLDING time under
      // ANSI when the url is a foldable literal (the guard is lazy at
      // runtime, not at optimize time)
      .withColumn("__portok",
        when(col("__portraw") === "" || col("__pz") === "", lit(true))
          .when(length(col("__pz")) <= 5,
            expr("try_cast(__pz AS INT)") <= 65535)
          .otherwise(lit(false)))
      .withColumn("__portpart",
        when(col("__port") === "" ||
             (col("__sch") === "http" && col("__port") === "80") ||
             (col("__sch") === "https" && col("__port") === "443"),
          lit("")).otherwise(concat(lit(":"), col("__port"))))
      // path: collapse //, resolve dot segments, strip trailing /
      // (root keeps its slash)
      .withColumn("__path0",
        regexp_replace(col("__rawpath"), "/{2,}", "/"))
      .withColumn("__pd", resolveDotSegments(col("__path0")))
      .withColumn("__dotok", !col("__pd").rlike(residualDotRe))
      .withColumn("__path",
        when(col("__pd") === "", lit("/"))
          .when(col("__pd") =!= "/" && col("__pd").endsWith("/"),
            expr("substring(__pd, 1, length(__pd) - 1)"))
          .otherwise(col("__pd")))
      // query params: one interpreted lambda — materialized once
      .withColumn("__params",
        filter(split(col("__rawq"), "&"),
          x => x =!= "" && !x.rlike(trackingParamRe)))
    parsed
      .withColumn("__q", array_join(sort_array(col("__params")), "&"))
      .withColumn("__ok",
        (col("__sch") === "http" || col("__sch") === "https") &&
          col("__host") =!= "" && col("__portok") && col("__dotok"))
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
      .drop("__u", "__sch", "__auth", "__rawpath", "__rawq", "__hp",
        "__portraw", "__host", "__pz", "__port", "__portok", "__portpart",
        "__path0", "__pd", "__dotok", "__path", "__params", "__q", "__ok")
  }

  /** Max label count of a loadable PSL rule KEY — bounds the number of
    * suffix-candidate broadcast joins in [[withPslSite]]. The real
    * list's deepest rules are 4 key labels; deeper rules are dropped
    * by [[loadPsl]] (documented, conservative: an unmatched host falls
    * back to the implicit-`*` single-label suffix). */
  val pslMaxKeyLabels: Int = 4

  /** Loads a Public Suffix List file (publicsuffix.org/list format:
    * `//` comments, blank lines, `rule`, `*.rule` wildcards, `!rule`
    * exceptions) into the one-row-per-MATCH-KEY shape
    * [[withPslSite]] joins against: `(key, klab, exc_ps, norm_ps)`.
    *
    * The PSL algorithm is re-expressed join-natively: a rule's match
    * key is its literal label tail (wildcards and exceptions strip
    * their marker), and what each rule IMPLIES when its key equals the
    * host's last-`klab` labels is a public-suffix LENGTH — `klab` for
    * a normal rule, `klab + 1` for a wildcard (`*` consumes one more
    * host label), `klab - 1` for an exception (the rule names a
    * registrable domain, so the suffix is one label shorter). An
    * exception match overrides everything (PSL spec); otherwise the
    * longest implied suffix wins; no match ⇒ the implicit `*` rule
    * (suffix = last label). Keys collapse to one row
    * (`max` per kind) so the candidate joins stay at-most-one-hit. */
  def loadPsl(spark: org.apache.spark.sql.SparkSession,
              path: String): DataFrame = {
    spark.read.text(path)
      .select(trim(col("value")).as("line"))
      .where(col("line") =!= "" && !col("line").startsWith("//"))
      .select(
        lower(when(col("line").startsWith("!"), expr("substring(line, 2)"))
          .when(col("line").startsWith("*."), expr("substring(line, 3)"))
          .otherwise(col("line"))).as("key"),
        col("line").startsWith("!").as("exc"),
        col("line").startsWith("*.").as("wild"))
      .withColumn("klab", size(split(col("key"), "\\.")))
      .where(col("klab") <= pslMaxKeyLabels)
      .withColumn("ps_len",
        when(col("exc"), col("klab") - 1)
          .when(col("wild"), col("klab") + 1)
          .otherwise(col("klab")))
      .groupBy("key", "klab")
      .agg(max(when(col("exc"), col("ps_len"))).as("exc_ps"),
        max(when(!col("exc"), col("ps_len"))).as("norm_ps"))
  }

  /** Adds `url_site_psl` — the REGISTRABLE domain (public suffix + one
    * label) of `hostCol` under a [[loadPsl]]-shaped table — fixing the
    * verdict's `url_site` gap: the last-2-labels fallback is wrong for
    * `*.co.uk` / `*.com.br`, so any registrable-domain quota or
    * per-site audit keyed on it merges every `co.uk` tenant into one.
    *
    * Scale shape: ZERO Exchange on the corpus — one suffix-candidate
    * column per key depth (`j = 1..pslMaxKeyLabels`, the host's last
    * `j` labels) each left-BROADCAST-joined against the ≤#rules PSL
    * partition of that depth, then a pure-expression selection
    * (exception match at any depth wins, else deepest implied suffix,
    * else the implicit-`*` single label). A host that IS a public
    * suffix (no registrable domain) and a NULL/dotless host fall back
    * to the host itself — documented, quota-safe. */
  def withPslSite(df: DataFrame, hostCol: String, psl: DataFrame): DataFrame = {
    var out = df
      .withColumn("__hl", split(col(hostCol), "\\."))
      .withColumn("__hn", size(col("__hl")))
    for (j <- 1 to pslMaxKeyLabels) {
      val pj = psl.where(col("klab") === j)
        .select(col("key").as(s"__k$j"), col("exc_ps").as(s"__e$j"),
          col("norm_ps").as(s"__m$j"))
      out = out
        .withColumn(s"__s$j",
          when(col("__hn") >= j,
            array_join(slice(col("__hl"), col("__hn") - j + 1, lit(j)), ".")))
        .join(broadcast(pj), col(s"__s$j") === col(s"__k$j"), "left")
    }
    val excPick = coalesce(col("__e4"), col("__e3"), col("__e2"), col("__e1"))
    val normBest = greatest(
      coalesce(col("__m4"), lit(0)), coalesce(col("__m3"), lit(0)),
      coalesce(col("__m2"), lit(0)), coalesce(col("__m1"), lit(0)))
    out
      .withColumn("__ps",
        coalesce(excPick, when(normBest > 0, normBest), lit(1)))
      .withColumn("url_site_psl",
        when(col(hostCol).isNull, lit(null).cast("string"))
          .when(col("__hn") > col("__ps"),
            array_join(
              slice(col("__hl"), col("__hn") - col("__ps"), col("__ps") + lit(1)),
              "."))
          .otherwise(col(hostCol)))
      .drop("__hl" +: "__hn" +: "__ps" +:
        (1 to pslMaxKeyLabels).flatMap(j =>
          Seq(s"__s$j", s"__k$j", s"__e$j", s"__m$j")): _*)
  }
}
