package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeedSpec extends SparkSpec {
  import spark.implicits._

  private def parse(xml: String) =
    Feed.parseFeed(Seq((1L, xml)).toDF("doc_id", "xml"))
      .orderBy("entry_index")
      .select("entry_index", "format", "title", "link", "entry_id",
        "published")
      .as[(Long, String, Option[String], Option[String], Option[String],
        Option[String])].collect().toSeq

  test("rss: items in order, guid/pubDate mapped, missing fields NULL") {
    val xml =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>Blog</title>
        |<item><title>A</title><link>http://x/a</link>
        |<guid>urn:a</guid><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
        |<item><title>B</title><link>http://x/b</link></item>
        |<item><guid>urn:c</guid></item>
        |</channel></rss>""".stripMargin
    val rows = parse(xml)
    rows.map(_._1) shouldBe Seq(0L, 1L, 2L)
    rows.map(_._2).distinct shouldBe Seq("rss")
    rows(0) shouldBe ((0L, "rss", Some("A"), Some("http://x/a"),
      Some("urn:a"), Some("Mon, 01 Jan 2024 00:00:00 GMT")))
    rows(1)._4 shouldBe Some("http://x/b")
    rows(1)._5 shouldBe None
    rows(2)._3 shouldBe None // link-less, title-less entry kept
    rows(2)._5 shouldBe Some("urn:c")
    // the channel <title> must NOT leak into item titles
    rows.flatMap(_._3) should not contain "Blog"
  }

  test("atom: entries with href attribute links, id/updated mapped") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<title>Site</title>
        |<entry><title>P1</title><link rel="alternate" href="http://y/1"/>
        |<id>tag:y,1</id><updated>2024-03-01T00:00:00Z</updated></entry>
        |<entry><title>P2</title><link href="http://y/2"/></entry>
        |</feed>""".stripMargin
    val rows = parse(xml)
    rows.map(_._2).distinct shouldBe Seq("atom")
    rows(0) shouldBe ((0L, "atom", Some("P1"), Some("http://y/1"),
      Some("tag:y,1"), Some("2024-03-01T00:00:00Z")))
    rows(1)._4 shouldBe Some("http://y/2")
    rows(1)._6 shouldBe None
  }

  test("neither rss nor atom -> zero rows; empty feeds; partition invariance") {
    parse("<html><body>not a feed</body></html>") shouldBe empty
    parse("<rss version=\"2.0\"><channel></channel></rss>") shouldBe empty
    parse("<feed></feed>") shouldBe empty
    val d = (0L until 40L).map { i =>
      val xml =
        if (i % 2 == 0)
          s"<rss><channel><item><title>T$i</title><link>http://h$i/p</link></item></channel></rss>"
        else
          s"""<feed><entry><title>T$i</title><link href="http://h$i/p"/></entry></feed>"""
      (i, xml)
    }.toDF("doc_id", "xml")
    assertSameRows(Feed.parseFeed(d), Feed.parseFeed(d.repartition(7)))
    Feed.parseFeed(d).count() shouldBe 40L
  }
}
