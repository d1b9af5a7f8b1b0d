package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("url", StringType, nullable = false)))

  private def canon(urls: String*): Seq[String] =
    df(schema, urls.map(Row(_)): _*)
      .select(Urls.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  private def domain(urls: String*): Seq[String] =
    df(schema, urls.map(Row(_)): _*)
      .select(Urls.registeredDomain(col("url")).as("d"))
      .as[String].collect().toSeq

  test("lowercases scheme and host, never path or query") {
    canon("HTTPS://WWW.ExAmple.COM/CaseSensitive/Path?Q=Mixed") shouldBe
      Seq("https://www.example.com/CaseSensitive/Path?Q=Mixed")
  }

  test("drops default ports only when they match the scheme") {
    canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "http://a.com:443/x", "https://a.com:80/x",
      "https://a.com:8443/x", "https://a.com/x") shouldBe Seq(
      "https://a.com/x", "http://a.com/x",
      "http://a.com:443/x", "https://a.com:80/x",
      "https://a.com:8443/x", "https://a.com/x")
  }

  test("drops fragments and tracking params, keeps order of the rest") {
    canon("https://a.com/p?utm_source=x&b=2&gclid=1&a=1&utm_campaign=y#frag",
      "https://a.com/p?utm_source=only",
      "https://a.com/p#only-frag") shouldBe Seq(
      "https://a.com/p?b=2&a=1",
      "https://a.com/p",
      "https://a.com/p")
  }

  test("trims trailing slashes; root path collapses to empty") {
    canon("https://a.com/", "https://a.com/p/", "https://a.com/p///",
      "https://a.com") shouldBe Seq(
      "https://a.com", "https://a.com/p", "https://a.com/p", "https://a.com")
  }

  test("non-URL strings pass through unchanged") {
    canon("not a url", "ftp.example.com/no-scheme") shouldBe
      Seq("not a url", "ftp.example.com/no-scheme")
  }

  test("registered domain is the last two host labels, case-folded") {
    domain("https://a.b.News.ExAmple.COM:8080/p?q=1",
      "http://example.com/", "https://single/x") shouldBe
      Seq("example.com", "example.com", "")
  }

  private def policyRules = Seq(
    (1L, "deny", "evil.com", ""),
    (2L, "allow", "evil.com", "/ok"),
    (3L, "deny", "", "/spam"))
    .toDF("rule_id", "action", "domain_suffix", "path_prefix")

  test("urlPolicy: carve-out allow beats domain deny; label boundary holds") {
    val urls = Seq(
      (1L, "https://a.evil.com/bad/x"),    // rule 1: denied
      (2L, "https://a.evil.com/ok/x"),     // rule 2 more specific: allowed
      (3L, "https://notevil.com/bad"),     // suffix must NOT match mid-label
      (4L, "https://good.com/spam/x"),     // global path deny
      (5L, "https://good.com/fine"))       // no match: default allow
      .toDF("doc_id", "url")
    val out = Urls.urlPolicy(urls, policyRules)
      .as[(Long, String, Option[Long], Option[String], Boolean)]
      .collect().map(r => r._1 -> ((r._3, r._5))).toMap
    out(1L) shouldBe ((Some(1L), false))
    out(2L) shouldBe ((Some(2L), true))
    out(3L) shouldBe ((None, true))
    out(4L) shouldBe ((Some(3L), false))
    out(5L) shouldBe ((None, true))
  }

  test("urlPolicy: equal specificity ties to the lowest rule_id; defaultAllow=false flips unmatched") {
    val rules = Seq(
      (7L, "deny", "x.com", ""), (4L, "allow", "y.com", "/ab"),
      (9L, "deny", "", "/abcde")) // same spec (5) as rule 4's 5... (4+2=6) adjust
      .toDF("rule_id", "action", "domain_suffix", "path_prefix")
    val tieRules = Seq(
      (8L, "deny", "t.com", "/p"), (2L, "allow", "t.com", "/p"))
      .toDF("rule_id", "action", "domain_suffix", "path_prefix")
    val out = Urls.urlPolicy(
        Seq((1L, "https://t.com/p/z")).toDF("doc_id", "url"), tieRules)
      .as[(Long, String, Option[Long], Option[String], Boolean)].collect()
    out.head._3 shouldBe Some(2L) // lowest rule_id wins the tie
    out.head._5 shouldBe true
    val strict = Urls.urlPolicy(
        Seq((1L, "https://unknown.org/q")).toDF("doc_id", "url"),
        rules, defaultAllow = false)
      .as[(Long, String, Option[Long], Option[String], Boolean)].collect()
    strict.head._5 shouldBe false
  }

  test("canonical form is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.ExAmple.COM:443/Dir/pg/?utm_source=f&id=3&q=2#Sec1",
      "http://Sub0.ExAmple3.CoM:8080/?utm_source=feed",
      "https://a.com/p?b=2&a=1")
    val once = canon(urls: _*)
    canon(once: _*) shouldBe once
  }

  private def frontier(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "url", "priority")

  test("politenessSchedule: per-domain serialization in priority order, subdomains share a queue") {
    val out = Urls.politenessSchedule(frontier(
        (1L, "https://a.site.com/x", 5L),
        (2L, "https://b.site.com/y", 9L),   // same registered domain
        (3L, "https://other.org/z", 1L)),
      "priority", delayMs = 1000)
      .select("doc_id", "domain", "queue_pos", "fetch_offset_ms")
      .as[(Long, String, Long, Long)].collect().toSet
    out shouldBe Set(
      (2L, "site.com", 1L, 0L),     // higher priority fetches first
      (1L, "site.com", 2L, 1000L),  // serialized 1 delay later
      (3L, "other.org", 1L, 0L))    // other domain starts immediately
  }

  test("politenessSchedule: domain cap drops the queue tail; ties break by id") {
    val rows = (1L to 6L).map(i => (i, s"https://hot.com/$i", 7L)) :+
      ((9L, "https://cold.com/a", 7L))
    val out = Urls.politenessSchedule(frontier(rows: _*),
        "priority", delayMs = 500, maxPerDomain = 4)
      .select("doc_id", "domain", "queue_pos")
      .as[(Long, String, Long)].collect().toSet
    // equal priorities: doc_id ascending is the deterministic order
    out shouldBe Set(
      (1L, "hot.com", 1L), (2L, "hot.com", 2L),
      (3L, "hot.com", 3L), (4L, "hot.com", 4L),
      (9L, "cold.com", 1L))
  }

  test("politenessSchedule is invariant under input partitioning") {
    val rows = (1L to 40L).map(i =>
      (i, s"https://d${i % 5}.example.com/p$i", i % 7))
    val d = frontier(rows: _*)
    assertSameRows(
      Urls.politenessSchedule(d, "priority", delayMs = 100, maxPerDomain = 6),
      Urls.politenessSchedule(d.repartition(7), "priority",
        delayMs = 100, maxPerDomain = 6))
  }
}
