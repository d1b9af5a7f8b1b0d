package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol 0.9 — public spec): the
  * third leg of crawl discovery next to robots.txt (E-robots) and the
  * frontier schedule (E-frontier) — a crawl seeds its frontier from
  * the URLs a site DECLARES, with the metadata that drives refresh
  * scheduling (lastmod/changefreq/priority). Entirely codegen'd
  * regexp built-ins over the XML text (the E104 HTML-cascade idiom —
  * RE2-safe non-greedy patterns, identical semantics in the oracle);
  * no XML library, no UDF, zero shuffle — one scan-side explode.
  *
  * Reference anchor: feeds the same frontier/politeness shelf as
  * [[Robots]] (SURVEY E-crawl rows); a <sitemapindex> file (nested
  * sitemaps) surfaces with is_index = true and its child sitemap
  * locs, so the caller can recurse the fetch loop. */
object Sitemap {

  private def tag(e: org.apache.spark.sql.Column, name: String) =
    nullif(regexp_extract(e, s"(?s)<$name>(.*?)</$name>", 1), lit(""))

  /** One row per `<url>` entry (or per `<sitemap>` child of an index
    * file): (idCol, url_index, is_index, loc, lastmod, changefreq,
    * priority) — loc per spec mandatory (entries without one surface
    * with loc NULL rather than being silently dropped: a malformed
    * entry is a data-quality signal, the family degrade rule);
    * optional fields NULL when absent. priority is kept as the spec's
    * decimal STRING — engines disagree on decimal-string→double
    * rounding at the third digit, and a scheduler compares it
    * lexicographically anyway ("0.9" > "0.10" is the spec's own
    * footgun, documented not hidden). */
  def parseSitemap(docs: DataFrame, idCol: String = "doc_id",
                   xmlCol: String = "xml"): DataFrame = {
    val isIndex = col(xmlCol).contains("<sitemapindex")
    // regexp_extract_all needs a FOLDABLE pattern, so both entry kinds
    // are extracted with literal patterns and `when` picks the array
    val entries = when(isIndex,
      regexp_extract_all(col(xmlCol),
        lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
      .otherwise(regexp_extract_all(col(xmlCol),
        lit("(?s)<url>(.*?)</url>"), lit(1)))
    docs.select(col(idCol), isIndex.as("is_index"),
        posexplode(entries).as(Seq("url_index", "__e")))
      .select(col(idCol), col("url_index").cast("long").as("url_index"),
        col("is_index"),
        tag(col("__e"), "loc").as("loc"),
        tag(col("__e"), "lastmod").as("lastmod"),
        tag(col("__e"), "changefreq").as("changefreq"),
        tag(col("__e"), "priority").as("priority"))
  }
}
