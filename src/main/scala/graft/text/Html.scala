package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the very first transform a web-crawl
  * pipeline applies (C4/CCNet/RefinedWeb all start from WET-style
  * extracted text; when you ingest raw WARC HTML you need this pass
  * before any quality/dedup operator can see prose). A full DOM parse
  * is neither available nor wanted at 100 TB — the standard trick is
  * a small regex cascade that drops non-content subtrees, strips
  * tags, and decodes the entities that actually occur at corpus
  * frequency. Every step is a codegen'd `regexp_replace` (RE2-safe:
  * lazy quantifiers, no backreferences), so extraction runs entirely
  * scan-side in whole-stage codegen — zero shuffle, and the raw HTML
  * column can be pruned immediately after.
  *
  * Cascade order matters and is part of the contract:
  *  1. `<script>`/`<style>`/comments dropped WITH their contents
  *     (tag-stripping alone would leak JS/CSS as "prose");
  *  2. block-level closers/openers (`p`, `div`, `br`, `li`, `h1-6`,
  *     `tr`) become newlines so paragraph structure survives for the
  *     line-level operators ([[Boilerplate]] keys on lines);
  *  3. every remaining tag stripped;
  *  4. the five XML-predefined entities + `&nbsp;` + numeric ASCII
  *     escapes decoded (AFTER tag-stripping, so `&lt;b&gt;` cannot
  *     resurrect as a tag — the classic double-decode bug);
  *  5. horizontal whitespace collapsed per line, blank runs collapsed
  *     to one newline, ends trimmed.
  */
object Html {

  private def re(c: Column, pat: String, rep: String): Column =
    regexp_replace(c, pat, rep)

  /** Extracted prose (see cascade above). */
  def extractText(html: Column): Column = {
    val noScript = re(re(re(html,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val blocks = re(noScript,
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)[^>]*>", "\n")
    val noTags = re(blocks, "(?s)<[^>]+>", " ")
    val decoded = re(re(re(re(re(re(re(noTags,
      "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&#(\\d+);", " "), "&amp;", "&")
    re(trim(re(re(re(decoded,
      "[ \\t\\x0B\\f\\r]+", " "),
      " ?\\n ?", "\n"), "\\n{2,}", "\n")), "^\\n+|\\n+$", "")
  }

  /** `<title>` contents, NULL when absent (regexp_extract returns ''
    * on no-match — mapped to NULL so absence is distinguishable). */
  def extractTitle(html: Column): Column = {
    val t = trim(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))
    when(t =!= "", t)
  }

  /** All `href` targets of anchor tags, in document order — the crawl
    * frontier feed; compose with [[Urls.canonicalizeUrl]] downstream. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\s[^>]*href\\s*=\\s*[\"']([^\"'>]+)[\"']"), lit(1))
}
