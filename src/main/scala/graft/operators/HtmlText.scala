package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CommonCrawl-shaped HTML ingestion — the raw-input format a
  * large-scale training-data pipeline actually reads, generalizing the
  * reference's single `<[^>]+>` tag-strip (reference Code/Main.java:83,
  * Code/DocInfo.java:25-26) into main-content extraction with
  * boilerplate removal:
  *
  *  1. metadata off the WHOLE page: `<title>`, `<html lang="…">`, the
  *     canonical `<link rel="canonical" href="…">` URL, and the
  *     declared charset (`<meta charset=…>` or the http-equiv
  *     `…; charset=…` form), lowercased;
  *  2. content region = first `<article>` block, else first `<main>`
  *     block, else the `<body>` (greedy, to the LAST `</body>`), else
  *     the whole page — the static-extraction priority order
  *     readability-style extractors converge on;
  *  3. boilerplate removal INSIDE the region: comments first (so a
  *     commented-out `<script>` can't confuse the block strip), then
  *     script/style/nav/header/footer/aside/form blocks WITH their
  *     content (lazy match to the first real closing tag;
  *     whitespace-only is allowed before its `>`);
  *  4. strip remaining tags, THEN decode the six ubiquitous entities
  *     (`&lt; &gt; &quot; &#39; &nbsp; &amp;` — `&amp;` strictly LAST,
  *     so `&amp;lt;` decodes to the literal text `&lt;`, and a decoded
  *     `<` is never re-parsed as a tag);
  *  5. collapse whitespace runs to single spaces and trim.
  *
  * Deliberate single-pass-regex quirks, pinned by the committed
  * fixture (the same discipline as WikiText's §1.3 quirks):
  * a quoted `>` inside an attribute truncates that tag's strip (the
  * reference's own `<[^>]+>` behavior), attribute order is fixed
  * (`rel` before `href`, `charset=` anywhere), and nested same-tag
  * boilerplate blocks close at the first closing tag. All regexes are
  * in the Java∩RE2 common subset (inline `(?is)` flags, lazy
  * quantifiers, non-capturing groups, NO lookaround/backreferences),
  * so the DuckDB twin replays them character-for-character.
  *
  * Scale posture: one projection of chained regexp/replace expressions
  * per page — stateless, whole-stage-codegen'd, no shuffle, no UDF;
  * at 100 TB this is a map-only scan exactly like the reference's
  * parse, and the driver-visible schema (url/lang/charset/title/text)
  * is what the downstream dedup/quality/tokenize operators consume.
  */
object HtmlText {

  // shared with the DuckDB twin via SparkEntry's SQL generators — any
  // change lands in both engines by construction
  val TitleRe = "(?is)<title[^>]*>(.*?)</title"
  val ArticleRe = "(?is)<article(?:\\s[^>]*)?>(.*?)</article\\s*>"
  val MainRe = "(?is)<main(?:\\s[^>]*)?>(.*?)</main\\s*>"
  val BodyRe = "(?is)<body(?:\\s[^>]*)?>(.*)</body\\s*>"
  val CommentRe = "(?s)<!--.*?-->"
  val BlockTags: Seq[String] =
    Seq("script", "style", "nav", "header", "footer", "aside", "form")
  def blockRe(tag: String): String =
    s"(?is)<$tag(?:\\s[^>]*)?>.*?</$tag\\s*>"
  val TagRe = "(?s)<[^>]*>"
  val LangRe = "(?i)<html[^>]*\\slang=\"([^\"]*)\""
  val CanonicalRe =
    "(?i)<link[^>]*rel=\"canonical\"[^>]*href=\"([^\"]*)\""
  val CharsetRe = "(?i)charset=[\"']?([a-zA-Z0-9_-]+)"
  val WsRe = "[ \\t\\n\\f\\r]+"
  /** Numeric character references (round-8 verdict #5): the frequent
    * ASCII / Latin-1 / typographic codes real crawl data carries.
    * Literal replace cannot compute chr(code) from a capture (neither
    * engine has replace-with-callback in the shared subset), so the
    * decode is a PINNED code table expanded to its common renderings:
    * decimal (`&#160;`), zero-padded decimal for the 2-digit codes
    * (`&#039;`), and the hex form in both digit cases
    * (`&#xa0;`/`&#xA0;`; the rare capital-X `&#X..;` rendering is out
    * of scope). The `&`-valued refs decode in the LAST group with
    * `&amp;` — see [[Entities]]. */
  val NumericCodes: Seq[(Int, String)] = Seq(
    160 -> " ", 34 -> "\"", 39 -> "'", 60 -> "<", 62 -> ">",
    169 -> "©", 174 -> "®", 176 -> "°",
    8211 -> "–", 8212 -> "—", 8216 -> "‘",
    8217 -> "’", 8220 -> "“", 8221 -> "”",
    8230 -> "…")

  /** The rendered reference forms of one numeric code, in application
    * order (decimal, zero-padded, hex lower, hex upper). */
  def refForms(code: Int): Seq[String] = {
    val hex = code.toHexString
    (Seq(s"&#$code;") ++
      (if (code < 100) Seq(f"&#0$code%d;") else Nil) ++
      Seq(s"&#x${hex.toLowerCase};", s"&#x${hex.toUpperCase};")).distinct
  }

  /** (entity, replacement) in APPLICATION ORDER — the `&`-valued
    * entities (`&amp;`, `&#38;`, `&#038;`, `&#x26;`) must stay in the
    * last group (see scaladoc step 4): `&amp;lt;` and `&amp;#160;`
    * decode exactly one level, to the literal texts `&lt;` / `&#160;`.
    * The amp-escaped rendering of a ref never CONTAINS the bare ref
    * (`&amp;#160;` has `amp;` between `&` and `#`), so the earlier
    * numeric passes cannot touch it. */
  val Entities: Seq[(String, String)] = (
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&nbsp;" -> " ") ++
      NumericCodes.flatMap { case (c, r) => refForms(c).map(_ -> r) } ++
      Seq("&#38;" -> "&", "&#038;" -> "&", "&#x26;" -> "&",
        "&amp;" -> "&")
    ).distinct

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, r)) =>
      replace(acc, lit(e), lit(r))
    }

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, WsRe, " "))

  /** The content region of one page (scaladoc step 2). */
  private def region(v: Column): Column = coalesce(
    nullif(regexp_extract(v, ArticleRe, 1), lit("")),
    nullif(regexp_extract(v, MainRe, 1), lit("")),
    nullif(regexp_extract(v, BodyRe, 1), lit("")),
    v)

  /** Boilerplate removal + tag strip + entity decode (steps 3–5). */
  private def cleanText(regionCol: Column): Column = {
    val noComments = regexp_replace(regionCol, CommentRe, " ")
    val noBlocks = BlockTags.foldLeft(noComments)((c, t) =>
      regexp_replace(c, blockRe(t), " "))
    collapseWs(decodeEntities(regexp_replace(noBlocks, TagRe, " ")))
  }

  /** P1-for-HTML: one page per input line (column `valueCol`) →
    * (url, lang, charset, title, text). Empty string where a metadata
    * field is absent (the regexp_extract no-match value in both
    * engines). */
  def extract(pages: DataFrame, valueCol: String = "value"): DataFrame = {
    val v = col(valueCol)
    pages.select(
      regexp_extract(v, CanonicalRe, 1).as("url"),
      regexp_extract(v, LangRe, 1).as("lang"),
      lower(regexp_extract(v, CharsetRe, 1)).as("charset"),
      collapseWs(decodeEntities(regexp_extract(v, TitleRe, 1)))
        .as("title"),
      cleanText(region(v)).as("text"))
  }

  /** Deterministic page template for the corpus-volume gate (the
    * wiki_parse_scale pattern): renders a documents row into a full
    * page whose extraction must return exactly
    * (url=https://example.org/p/ID, lang, charset=utf-8,
    * title="doc ID", text) — boilerplate header/nav/aside/footer and a
    * head script included so every removal rule fires on every page.
    * Kept as (prefix-parts…) so the Spark render and the SQL render
    * concatenate the IDENTICAL fragments. */
  val PageTemplate: Seq[String] = Seq(
    "<html lang=\"", // + lang
    "\"><head><meta charset=\"utf-8\"><title>doc ", // + doc_id
    "</title><script>var n=", // + doc_id
    ";</script><link rel=\"canonical\" href=\"https://example.org/p/",
    // + doc_id
    "\"></head><body><header>corpus site</header><nav>home | about" +
      "</nav><article><p>", // + text
    "</p></article><aside>related links</aside><footer>footer text" +
      "</footer></body></html>")

  /** Render documents rows into template pages (one per line). */
  def renderPages(docs: DataFrame): DataFrame = {
    val t = PageTemplate
    docs.select(concat(
      lit(t(0)), col("lang"),
      lit(t(1)), col("doc_id").cast("string"),
      lit(t(2)), col("doc_id").cast("string"),
      lit(t(3)), col("doc_id").cast("string"),
      lit(t(4)), col("text"),
      lit(t(5))).as("value"))
  }
}
