package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the intake step BEFORE every gate
  * this engine has: a web corpus arrives as pages, and quality scoring
  * / dedup / langid all want the article text, not the navigation
  * chrome around it. The reference itself crosses this boundary (its
  * collector parses loom tables out of CGI HTML,
  * src/tms_colector.py:252-286 — gated here as q119's S8 slice); this
  * operator is the general-web form: tag-strip + per-block
  * LINK-DENSITY boilerplate scoring, the JusText/boilerpipe heuristic
  * (Kohlschütter et al. WSDM 2010) reduced to its load-bearing rule —
  * navigation, sidebars and footers are link-dense and short; article
  * text is link-sparse and long.
  *
  * Everything is pure Catalyst expressions (regexp + higher-order
  * functions over the segment array) — no UDF, no parser library: one
  * scan-side projection, ZERO shuffles, per-document independent, so
  * the operator costs a map pass at any corpus size and every regex is
  * written in the RE2-compatible subset (inline (?is) flags, lazy
  * quantifiers, NO backreferences) so the DuckDB oracle can run the
  * byte-identical pattern.
  *
  * Extraction model:
  *  1. [[stripNonContent]]: script/style/noscript blocks and comments
  *     are VOID — their text was never visible.
  *  2. Split on block-level tag boundaries ([[blockTagSplit]]): block
  *     tags delimit visual text blocks; inline markup (<a>, <b>,
  *     <span>…) stays inside its segment.
  *  3. Per segment: `txt` = visible text (tags stripped, the five
  *     HTML core entities + &nbsp; decoded — non-amp entities first,
  *     &amp; LAST, so `&amp;lt;` correctly yields `&lt;` — whitespace
  *     collapsed); `atxt` = the visible text of the segment's <a>
  *     bodies, the numerator of link density.
  *  4. Keep segments with `length(txt) >= minChars` and link density
  *     `length(atxt)/length(txt) <= maxLinkBp/10⁴` (cross-multiplied —
  *     no division, no float); main content = kept segments joined.
  */
object HtmlExtract {

  /** Block-level boundary tags (open or close, any attributes). */
  val blockTagSplit: String =
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|td|tr|th|table|article|section" +
      "|header|footer|nav|aside|main|blockquote|form|select|option)\\b[^>]*>"

  /** Anchor bodies — group 1 is the (still-marked-up) link text. */
  val anchorBody: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Remove invisible blocks: the whole <head> (title/meta/links are
    * metadata, never rendered text), script/style/noscript contents
    * anywhere in the body, and comments. Separate per-tag patterns
    * instead of a backreferenced `</\1>` — RE2 (the oracle engine)
    * has no backreferences; `head\b` does not match `<header>`. */
  def stripNonContent(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "(?is)<head\\b[^>]*>.*?</head>", " "),
            "(?is)<script\\b[^>]*>.*?</script>", " "),
          "(?is)<style\\b[^>]*>.*?</style>", " "),
        "(?is)<noscript\\b[^>]*>.*?</noscript>", " "),
      "(?s)<!--.*?-->", " ")

  /** The five core entities + &nbsp;, decoded with &amp; LAST (so
    * `&amp;lt;` → `&lt;`, never double-decoded to `<`). */
  private def entityDecode(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&nbsp;"), lit(" ")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Visible text of an HTML fragment: tags → space, entities decoded,
    * whitespace collapsed, trimmed. */
  def visibleText(c: Column): Column =
    trim(regexp_replace(
      entityDecode(regexp_replace(c, "<[^>]*>", " ")), "\\s+", " "))

  /** Main-content extraction. Output one row per input row:
    * (idCol, n_segments, n_kept, main_text) — n_segments counts
    * segments with any visible text (empty split artifacts are
    * invisible to both engines, which also neutralizes the
    * trailing-empty split-semantics difference between Java and RE2
    * splitters), n_kept the ones surviving the length + link-density
    * rule, main_text their space-joined visible text.
    *
    * The segment struct array is materialized ONCE per document in its
    * own projection (interpreted higher-order lambdas are not CSE'd —
    * the repo's tokens(text) discipline), then the non-empty and kept
    * arrays each once more; the three output columns only re-read
    * those arrays. */
  def mainContent(idCol: String, htmlCol: String, minChars: Int = 25,
                  maxLinkBp: Long = 3333)(df: DataFrame): DataFrame = {
    require(minChars >= 1, s"minChars must be positive: $minChars")
    require(maxLinkBp >= 0 && maxLinkBp <= 10000, s"maxLinkBp: $maxLinkBp")
    val segs = split(stripNonContent(col(htmlCol)), blockTagSplit)
    val stats = transform(segs, s => struct(
      visibleText(s).as("txt"),
      visibleText(array_join(
        regexp_extract_all(s, lit(anchorBody), lit(1)), " ")).as("atxt")))
    df.withColumn("__ne", filter(stats, x => x.getField("txt") =!= ""))
      .withColumn("__kept", filter(col("__ne"), x =>
        length(x.getField("txt")) >= minChars &&
          length(x.getField("atxt")) * lit(10000L) <=
            lit(maxLinkBp) * length(x.getField("txt"))))
      .select(col(idCol),
        size(col("__ne")).cast("long").as("n_segments"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(transform(col("__kept"), x => x.getField("txt")), " ")
          .as("main_text"))
  }
}
