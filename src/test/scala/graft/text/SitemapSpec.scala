package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def parse(xml: String) =
    Sitemap.parseSitemap(Seq((1L, xml)).toDF("doc_id", "xml"))
      .orderBy("url_index")
      .select("url_index", "is_index", "loc", "lastmod", "changefreq",
        "priority")
      .as[(Long, Boolean, Option[String], Option[String], Option[String],
        Option[String])].collect().toSeq

  test("urlset: entries in order, optional fields NULL when absent, loc-less entry kept") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc>http://x/a</loc><lastmod>2024-01-02</lastmod>
        |<changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>http://x/b</loc></url>
        |<url><priority>0.1</priority></url>
        |</urlset>""".stripMargin
    val rows = parse(xml)
    rows.map(_._1) shouldBe Seq(0L, 1L, 2L)
    rows.map(_._2).distinct shouldBe Seq(false)
    rows(0) shouldBe ((0L, false, Some("http://x/a"), Some("2024-01-02"),
      Some("daily"), Some("0.8")))
    rows(1)._3 shouldBe Some("http://x/b")
    rows(1)._4 shouldBe None
    rows(2)._3 shouldBe None // malformed entry surfaces, not dropped
    rows(2)._6 shouldBe Some("0.1")
  }

  test("sitemapindex: child sitemaps come back with is_index = true") {
    val xml = "<sitemapindex>" +
      "<sitemap><loc>http://x/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>" +
      "<sitemap><loc>http://x/s2.xml</loc></sitemap></sitemapindex>"
    val rows = parse(xml)
    rows.map(r => (r._1, r._2, r._3)) shouldBe Seq(
      (0L, true, Some("http://x/s1.xml")),
      (1L, true, Some("http://x/s2.xml")))
    rows(0)._4 shouldBe Some("2024-02-01")
    rows(1)._4 shouldBe None
  }

  test("no entries -> no rows; partition invariance") {
    parse("<urlset></urlset>") shouldBe empty
    val d = (0L until 40L).map(i =>
      (i, s"<urlset><url><loc>http://h$i/p</loc></url></urlset>"))
      .toDF("doc_id", "xml")
    assertSameRows(Sitemap.parseSitemap(d),
      Sitemap.parseSitemap(d.repartition(7)))
  }
}
