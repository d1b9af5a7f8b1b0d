package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** [[Robots]] — RFC 9309 group semantics hand-pinned: consecutive-UA
  * heads, rule-then-UA group boundaries, orphan-rule drop, comment
  * and case handling, the exact-agent-beats-* pick, longest-path
  * precedence with allow winning ties, the empty-Disallow idiom, and
  * partitioning invariance. */
class RobotsSpec extends SparkSpec {

  private def hosts(rows: (String, String)*): DataFrame =
    df(StructType(Seq(
      StructField("host", StringType),
      StructField("robots_txt", StringType))),
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)): _*)

  private def urls(rows: (Long, String, String)*): DataFrame =
    df(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("host", StringType),
      StructField("path", StringType))),
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)): _*)

  test("parse: consecutive UA lines share a head; a UA after rules opens a new group") {
    val out = Robots.parseRobots(hosts("h" ->
      "User-agent: A\nUser-agent: B\nDisallow: /x\nUser-agent: C\nAllow: /y\n"))
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getString(4)))
      .toSet
    out shouldBe Set(
      (1L, "a", "disallow", "/x"), (1L, "b", "disallow", "/x"),
      (2L, "c", "allow", "/y"))
  }

  test("parse: orphan rules before any UA drop; comments and case are handled; crawl-delay kept") {
    val out = Robots.parseRobots(hosts("h" ->
      "Disallow: /orphan\n# a comment\nUSER-AGENT: Bot # tail comment\nCRAWL-DELAY: 2\nDISALLOW: /z\n"))
      .collect().map(r => (r.getString(2), r.getString(3), r.getString(4))).toSet
    out shouldBe Set(("bot", "crawl-delay", "2"), ("bot", "disallow", "/z"))
  }

  test("allowed: exact agent group beats *, longest path wins, allow wins length ties") {
    val r = Robots.parseRobots(hosts("h" ->
      ("User-agent: mybot\nDisallow: /a\nAllow: /a/b\nDisallow: /same\nAllow: /same\n\n" +
       "User-agent: *\nDisallow: /\n")))
    val out = Robots.robotsAllowed(
      urls((1L, "h", "/a/c"), (2L, "h", "/a/b/c"), (3L, "h", "/same/x"),
        (4L, "h", "/free")), r, agent = "MyBot")
      .collect().map(x => (x.getLong(0), x.getBoolean(3))).toMap
    out shouldBe Map(
      1L -> false, // /a denies
      2L -> true,  // /a/b (4) beats /a (2)
      3L -> true,  // equal length: allow wins the tie
      4L -> true)  // no rule matches -> allowed
  }

  test("allowed: * group applies when no exact match; empty Disallow matches nothing") {
    val r = Robots.parseRobots(hosts(
      "h1" -> "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp\n",
      "h2" -> "User-agent: *\nDisallow:\n"))
    val out = Robots.robotsAllowed(
      urls((1L, "h1", "/tmp/x"), (2L, "h1", "/ok"),
        (3L, "h2", "/anything")), r, agent = "mybot")
      .collect().map(x => (x.getLong(0), x.getBoolean(3))).toMap
    out shouldBe Map(1L -> false, 2L -> true, 3L -> true)
  }

  test("allowed: a host with no rules at all allows everything (left join contract)") {
    val r = Robots.parseRobots(hosts("h1" -> "User-agent: *\nDisallow: /\n"))
    val out = Robots.robotsAllowed(
      urls((1L, "h1", "/x"), (2L, "unknown-host", "/x")), r, "bot")
      .collect().map(x => (x.getLong(0), x.getBoolean(3))).toMap
    out shouldBe Map(1L -> false, 2L -> true)
  }

  test("deterministic across partitionings") {
    val h = hosts((0 until 12).map(i =>
      (s"h$i", s"User-agent: *\nDisallow: /d$i\nAllow: /d$i/ok\n")): _*)
    val u = urls((1L to 60L).map(i =>
      (i, s"h${i % 12}", if (i % 2 == 0) s"/d${i % 12}/ok/p" else s"/d${i % 12}/x")): _*)
    val r1 = Robots.robotsAllowed(u, Robots.parseRobots(h), "b")
    val r2 = Robots.robotsAllowed(u.repartition(7),
      Robots.parseRobots(h.repartition(5)), "b")
    assertSameRows(r1, r2)
  }
}
