package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing (the RSS 2.0 spec at the RSS Advisory
  * Board and RFC 4287 — public specs): the FOURTH leg of crawl
  * discovery next to robots.txt, sitemaps, and the frontier schedule
  * — feeds are how a crawl discovers NEW urls between sitemap
  * refreshes (publish streams), and the per-entry timestamps drive
  * recrawl scheduling exactly like sitemap lastmod. Entirely
  * codegen'd regexp built-ins over the XML text (the Sitemap/E104
  * idiom — RE2-safe non-greedy patterns, identical semantics in the
  * oracle); no XML library, no UDF, zero shuffle — one scan-side
  * posexplode.
  *
  * Format detection: a document containing `<feed` parses as Atom
  * (`<entry>` items, `<link href="…"/>` attributes, `<id>`,
  * `<updated>`); otherwise `<item>` blocks parse as RSS (`<link>`
  * text, `<guid>`, `<pubDate>`). A document that is neither yields
  * zero rows (posexplode of the empty match array — the honest empty
  * answer); an entry missing a field surfaces that field as NULL
  * rather than dropping the row (the Sitemap loc rule: malformed is
  * a data-quality signal, not silence). */
object Feed {

  private def tag(e: org.apache.spark.sql.Column, name: String) =
    nullif(regexp_extract(e, s"(?s)<$name>(.*?)</$name>", 1), lit(""))

  /** One row per feed entry: (idCol, entry_index, format, title,
    * link, entry_id, published). */
  def parseFeed(docs: DataFrame, idCol: String = "doc_id",
                xmlCol: String = "xml"): DataFrame = {
    val isAtom = col(xmlCol).contains("<feed")
    // regexp_extract_all needs a FOLDABLE pattern (the parseSitemap
    // rule), so both entry kinds use literal patterns and `when`
    // picks the array
    val entries = when(isAtom,
      regexp_extract_all(col(xmlCol),
        lit("(?s)<entry>(.*?)</entry>"), lit(1)))
      .otherwise(regexp_extract_all(col(xmlCol),
        lit("(?s)<item>(.*?)</item>"), lit(1)))
    docs.select(col(idCol), isAtom.as("__atom"),
        posexplode(entries).as(Seq("entry_index", "__e")))
      .select(col(idCol),
        col("entry_index").cast("long").as("entry_index"),
        when(col("__atom"), lit("atom")).otherwise(lit("rss"))
          .as("format"),
        tag(col("__e"), "title").as("title"),
        when(col("__atom"),
          nullif(regexp_extract(col("__e"),
            "<link[^>]*href=\"(.*?)\"", 1), lit("")))
          .otherwise(tag(col("__e"), "link")).as("link"),
        when(col("__atom"), tag(col("__e"), "id"))
          .otherwise(tag(col("__e"), "guid")).as("entry_id"),
        when(col("__atom"), tag(col("__e"), "updated"))
          .otherwise(tag(col("__e"), "pubDate")).as("published"))
  }
}
