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

  test("canonical form is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.ExAmple.COM:443/Dir/pg/?utm_source=f&id=3&q=2#Sec1",
      "http://Sub0.ExAmple3.CoM:8080/?utm_source=feed",
      "https://a.com/p?b=2&a=1")
    val once = canon(urls: _*)
    canon(once: _*) shouldBe once
  }
}
