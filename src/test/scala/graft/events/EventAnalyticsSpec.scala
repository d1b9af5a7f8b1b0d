package graft.events

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, countDistinct}
import org.apache.spark.sql.types._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  private def ev(id: Long, minute: Long, user: Long, typ: String = "click",
                 value: Double = 1.0, props: String = """{"k": 1}""") =
    Row(id, new Timestamp(minute * 60000L), user, typ, value, props)

  test("mergeIntervals: overlap and touch merge, gaps split, containment absorbs") {
    val iv = Seq(
      (1L, 0L, 10L),    // island 1: [0,10]
      (1L, 5L, 20L),    //   overlaps -> extends to 20
      (1L, 12L, 15L),   //   CONTAINED in running union -> absorbed
      (1L, 20L, 30L),   //   touches (start == max end) -> merges
      (1L, 40L, 50L),   // island 2 after a gap
      (2L, 0L, 5L))     // other key: own island
      .toDF("user_id", "s", "e")
    val out = EventAnalytics.mergeIntervals(iv, Seq("user_id"), "s", "e")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted
    out.toSeq shouldBe Seq(
      (1L, 1L, 0L, 30L, 4L, 30L),
      (1L, 2L, 40L, 50L, 1L, 10L),
      (2L, 1L, 0L, 5L, 1L, 5L))
  }

  test("intervalIntersection: hand-computed overlap; touching intervals contribute zero") {
    val ia = Seq((1L, 0L, 10L), (1L, 20L, 30L), (2L, 0L, 5L))
      .toDF("user_id", "s", "e")
    val ib = Seq(
      (1L, 5L, 25L),   // overlaps [5,10) with A1 and [20,25) with A2
      (2L, 5L, 9L))    // TOUCHES A's [0,5) at 5: closed-open => zero
      .toDF("user_id", "s", "e")
    val out = EventAnalytics.intervalIntersection(
        ia, ib, Seq("user_id"), "s", "e")
      .as[(Long, Long, Long)].collect().sorted
    out.toSeq shouldBe Seq((1L, 10L, 2L)) // 5 + 5 over two segments
  }

  test("intervalIntersection: overlapping same-side intervals don't double-count") {
    // two A intervals covering [0,10) and [5,15): B [0,20) overlap is
    // the UNION's 15, not 10+15
    val ia = Seq((1L, 0L, 10L), (1L, 5L, 15L)).toDF("user_id", "s", "e")
    val ib = Seq((1L, 0L, 20L)).toDF("user_id", "s", "e")
    val out = EventAnalytics.intervalIntersection(
        ia, ib, Seq("user_id"), "s", "e")
      .as[(Long, Long, Long)].collect()
    out.head._2 shouldBe 15L
  }

  test("intervalIntersection is invariant under input partitioning") {
    val ia = (1 to 60).map(i => (i % 4L, i * 3L % 50, i * 3L % 50 + 7))
      .toDF("user_id", "s", "e")
    val ib = (1 to 60).map(i => (i % 4L, i * 7L % 50, i * 7L % 50 + 5))
      .toDF("user_id", "s", "e")
    assertSameRows(
      EventAnalytics.intervalIntersection(ia, ib, Seq("user_id"), "s", "e"),
      EventAnalytics.intervalIntersection(ia.repartition(7),
        ib.repartition(5), Seq("user_id"), "s", "e"))
  }

  test("mergeIntervals is invariant under input partitioning") {
    val iv = (1 to 100).map { i =>
      (i % 5L, i.toLong * 7 % 60, i.toLong * 7 % 60 + 3 + i % 11)
    }.toDF("user_id", "s", "e")
    assertSameRows(
      EventAnalytics.mergeIntervals(iv, Seq("user_id"), "s", "e"),
      EventAnalytics.mergeIntervals(iv.repartition(7), Seq("user_id"), "s", "e"))
  }

  test("sessionize splits on gaps > 30 minutes, per user") {
    val d = df(schema,
      ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 1), // session 1: 0-20
      ev(4, 60, 1), ev(5, 65, 1),              // session 2: 60-65 (40m gap)
      ev(6, 0, 2))                             // user 2, own session
    val out = EventAnalytics.sessionize(d, gapMinutes = 30)
      .select("user_id", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().sorted
    out.toSeq shouldBe Seq((1L, 1L, 3L), (1L, 2L, 2L), (2L, 1L, 1L))
  }

  test("a gap of exactly 30 minutes does NOT split the session") {
    val d = df(schema, ev(1, 0, 1), ev(2, 30, 1), ev(3, 61, 1))
    val out = EventAnalytics.sessionize(d, gapMinutes = 30)
      .select("session_seq", "n_events").as[(Long, Long)].collect().sorted
    // 0 -> 30 stays (== gap), 30 -> 61 splits (> gap)
    out.toSeq shouldBe Seq((1L, 2L), (2L, 1L))
  }

  test("session bounds and value sums are exact") {
    val d = df(schema,
      ev(1, 0, 1, value = 0.1), ev(2, 5, 1, value = 0.2), ev(3, 9, 1, value = 0.3))
    val r = EventAnalytics.sessionize(d).collect().head
    r.getAs[Timestamp]("session_start").getTime shouldBe 0L
    r.getAs[Timestamp]("session_end").getTime shouldBe 9 * 60000L
    r.getAs[Double]("total_value") shouldBe 0.6 // exact via decimal sum
  }

  test("windowedStats buckets on hour boundaries and extracts JSON props") {
    val d = df(schema,
      ev(1, 10, 1, "view", 1.0, """{"k": 5}"""),
      ev(2, 50, 2, "view", 2.0, """{"k": 7}"""),
      ev(3, 70, 1, "view", 4.0, """{"k": 11}"""))
    val out = EventAnalytics.windowedStats(d, "1 hour")
      .select("n_events", "unique_users", "total_value", "sum_k")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    out.toSeq shouldBe Seq((1L, 1L, 4.0, 11L), (2L, 2L, 3.0, 12L))
  }

  test("propLong reads integer properties, null on absent field") {
    val d = df(schema, ev(1, 0, 1, props = """{"k": 42}"""))
    d.select(EventAnalytics.propLong(org.apache.spark.sql.functions.col("props"), "k"))
      .as[Long].head() shouldBe 42L
    d.select(EventAnalytics.propLong(org.apache.spark.sql.functions.col("props"), "zz"))
      .as[Option[Long]].head() shouldBe None
  }

  test("transitionMatrix: hand-counted pairs, exact permille shares, per-user sequences") {
    val d = df(schema,
      // user 1: a b a c a b  -> a->b:2 a->c:1 b->a:1 c->a:1
      ev(1, 1, 1, "a"), ev(2, 2, 1, "b"), ev(3, 3, 1, "a"),
      ev(4, 4, 1, "c"), ev(5, 5, 1, "a"), ev(6, 6, 1, "b"),
      // user 2: b b  -> b->b:1 (sequences never cross users)
      ev(7, 1, 2, "b"), ev(8, 2, 2, "b"))
    val out = EventAnalytics.transitionMatrix(d)
      .as[(String, String, Long, Long)].collect().toSet
    out shouldBe Set(
      ("a", "b", 2L, 666L), // floor(2000/3)
      ("a", "c", 1L, 333L),
      ("b", "a", 1L, 500L),
      ("b", "b", 1L, 500L),
      ("c", "a", 1L, 1000L))
  }

  test("funnelSteps: strict order, per-step timeout, earliest-entry semantics") {
    val d = df(schema,
      // user 1 completes all three in order within timeouts
      ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
      // user 2: click BEFORE view — step 2 never completes
      ev(4, 0, 2, "click"), ev(5, 10, 2, "view"),
      // user 3: click too late (40m > 30m timeout)
      ev(6, 0, 3, "view"), ev(7, 40, 3, "click"),
      // user 4: two views; the EARLIEST starts the clock, so the
      // click at 35m is outside the first view's window
      ev(8, 0, 4, "view"), ev(9, 20, 4, "view"), ev(10, 35, 4, "click"),
      // user 5: purchase with no view at all
      ev(11, 0, 5, "purchase"))
    val out = EventAnalytics.funnelSteps(d,
        Seq("view", "click", "purchase"), withinMinutes = 30)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, "view", 4L, 1000L),     // users 1-4
      (2L, "click", 1L, 250L),     // only user 1
      (3L, "purchase", 1L, 250L))
    // same-instant events do NOT chain (strictly-after contract)
    val tied = df(schema, ev(1, 5, 9, "view"), ev(2, 5, 9, "click"))
    EventAnalytics.funnelSteps(tied, Seq("view", "click"), 30)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      .map(_._3).toSeq shouldBe Seq(1L, 0L)
  }

  test("sessionPaths: ordered per-session journeys counted, gap splits, top-k stable") {
    val d = df(schema,
      ev(1, 0, 1, "a"), ev(2, 5, 1, "b"),    // user 1, session 1: a>b
      ev(3, 60, 1, "a"), ev(4, 65, 1, "b"),  // user 1, session 2 (40m gap): a>b
      ev(5, 0, 2, "a"), ev(6, 1, 2, "b"),    // user 2: a>b
      ev(7, 0, 3, "c"))                      // user 3: c
    val out = EventAnalytics.sessionPaths(d, gapMinutes = 30, k = 10)
      .as[(String, Long)].collect().toSeq
    out shouldBe Seq(("a>b", 3L), ("c", 1L))
    // k cuts deterministically: top-1 keeps the most frequent path
    EventAnalytics.sessionPaths(d, 30, 1).as[(String, Long)].collect()
      .toSeq shouldBe Seq(("a>b", 3L))
    // order inside the path comes from (ts, event_id), not row order
    val tied = df(schema, ev(2, 5, 9, "y"), ev(1, 5, 9, "x"))
    EventAnalytics.sessionPaths(tied, 30, 5).as[(String, Long)]
      .collect().toSeq shouldBe Seq(("x>y", 1L))
    assertSameRows(EventAnalytics.sessionPaths(d, 30, 10),
      EventAnalytics.sessionPaths(d.repartition(7), 30, 10))
  }

  test("transitionMatrix: timestamp ties break on event_id; partitioning-invariant") {
    val tied = df(schema,
      ev(2, 5, 1, "y"), ev(1, 5, 1, "x"), ev(3, 6, 1, "z"))
    val out = EventAnalytics.transitionMatrix(tied)
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    out shouldBe Set(("x", "y"), ("y", "z")) // id order, not row order
    val d = df(schema, (1 to 40).map(i =>
      ev(i.toLong, i.toLong, i % 3L, if (i % 2 == 0) "a" else "b")): _*)
    assertSameRows(EventAnalytics.transitionMatrix(d),
      EventAnalytics.transitionMatrix(d.repartition(7)))
  }

  test("attribution: equal split, last-touch remainder, strict window, (none) mass") {
    val d = df(schema,
      // user 1: purchase@100, touches view@40 click@50 view@99.
      // 1000 div 3 = 333 each, remainder 1 to the LAST (view@99).
      ev(1, 40, 1, "view"), ev(2, 50, 1, "click"), ev(3, 99, 1, "view"),
      ev(10, 100, 1, "purchase"),
      // user 2: purchase with no touches at all
      ev(20, 200, 2, "purchase"),
      // user 3: touch exactly AT the conversion instant — excluded
      ev(31, 300, 3, "view"), ev(30, 300, 3, "purchase"),
      // user 4: touch outside the 60-minute lookback (430 < 500-60)
      ev(41, 430, 4, "view"), ev(40, 500, 4, "purchase"))
    val out = EventAnalytics.attribution(d, lookbackMinutes = 60)
      .collect().map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_conversions"), r.getAs[Long]("credit_permille")))
      .toMap
    // view@40 sits exactly on the lookback boundary (100-60) — included
    out("view") shouldBe (1L, 667L)
    out("click") shouldBe (1L, 333L)
    out("(none)") shouldBe (3L, 3000L)
    // the audit invariant: total credit == 1000 x conversions
    out.values.map(_._2).sum shouldBe 4000L
  }

  test("entryExit: first/last per session, bounce diagonal, gap split") {
    val d = df(schema,
      // u1 one session a..c
      ev(1, 0, 1, "a"), ev(2, 5, 1, "b"), ev(3, 10, 1, "c"),
      // u1 second session after a 40-min gap: single event = bounce
      ev(4, 60, 1, "x"),
      // u2: ties at minute 0 resolve by event_id: entry a (id 5), exit b (id 6)
      ev(5, 0, 2, "a"), ev(6, 0, 2, "b"))
    val out = EventAnalytics.entryExit(d)
      .collect().map(r => (r.getAs[String]("entry_type"),
        r.getAs[String]("exit_type")) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounces"))).toMap
    out(("a", "c")) shouldBe ((1L, 0L))
    out(("x", "x")) shouldBe ((1L, 1L))
    out(("a", "b")) shouldBe ((1L, 0L))
    assertSameRows(EventAnalytics.entryExit(d),
      EventAnalytics.entryExit(d.repartition(5)))
  }

  test("longestStreaks: islands by the rn-difference identity, ties to earliest") {
    val d = df(schema,
      // user 1: a a b a a a b -> runs: a(2) b(1) a(3) b(1); longest a=3
      ev(1, 1, 1, "a"), ev(2, 2, 1, "a"), ev(3, 3, 1, "b"),
      ev(4, 4, 1, "a"), ev(5, 5, 1, "a"), ev(6, 6, 1, "a"),
      ev(7, 7, 1, "b"),
      // user 2: x y -> two runs of 1, tie -> earliest (x)
      ev(8, 1, 2, "x"), ev(9, 2, 2, "y"))
    val out = EventAnalytics.longestStreaks(d)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_runs"), r.getAs[Long]("longest_streak"),
         r.getAs[String]("streak_type"))).toMap
    out(1L) shouldBe ((4L, 3L, "a"))
    out(2L) shouldBe ((2L, 1L, "x"))
    assertSameRows(EventAnalytics.longestStreaks(d),
      EventAnalytics.longestStreaks(d.repartition(5)))
  }

  test("burstAudit: RANGE frame catches straddling bursts fixed buckets miss") {
    // user 1: events at minutes 50, 55, 65, 70 — a 4-event burst
    // inside [50, 70] that straddles the 0-60/60-120 hour buckets;
    // any tumbling-bucket count sees at most 2.
    val d = df(schema,
      ev(1, 50, 1), ev(2, 55, 1), ev(3, 65, 1), ev(4, 70, 1),
      // user 2: two events 2 hours apart — never more than 1 in window
      ev(5, 0, 2), ev(6, 120, 2))
    val out = EventAnalytics.burstAudit(d, windowMinutes = 60, limit = 3)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("max_burst"), r.getAs[Long]("peak_at_us"),
         r.getAs[Boolean]("over_limit"))).toMap
    out(1L) shouldBe ((4L, 70L * 60000000L, true)) // peak when the 4th lands
    out(2L) shouldBe ((1L, 0L, false)) // earliest instant of the max burst
    assertSameRows(EventAnalytics.burstAudit(d, 60, 3),
      EventAnalytics.burstAudit(d.repartition(5), 60, 3))
  }

  test("peakConcurrency: overlap sweep, midnight split, handoff counts both") {
    val d = df(schema,
      // day 1: u1 session 10-20, u2 15-25 (overlap -> peak 2), u3 30-40
      ev(1, 10, 1), ev(2, 20, 1),
      ev(3, 15, 2), ev(4, 25, 2),
      ev(5, 30, 3), ev(6, 40, 3),
      // u4 session spans midnight: 23:50 day1 -> 00:10 day2
      ev(7, 1430, 4), ev(8, 1450, 4))
    val out = EventAnalytics.peakConcurrency(d)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_sessions"))).toMap
    out("1970-01-01") shouldBe ((2L, 4L)) // u1-u3 + u4's day-1 slice
    out("1970-01-02") shouldBe ((1L, 1L)) // u4's day-2 slice
    // a session ending exactly when another starts: both open at t
    val handoff = df(schema,
      ev(10, 0, 7), ev(11, 10, 7),
      ev(12, 10, 8), ev(13, 20, 8))
    EventAnalytics.peakConcurrency(handoff).collect()
      .head.getAs[Long]("peak_concurrency") shouldBe 2L
    assertSameRows(EventAnalytics.peakConcurrency(d),
      EventAnalytics.peakConcurrency(d.repartition(7)))
  }

  test("conversionLatency: cohorts by first-view day, exact quartiles, non-converters drop") {
    val d = df(schema,
      // cohort day 0: three converters with latencies 10m, 20m, 30m
      ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase"),
      ev(3, 5, 2, "view"), ev(4, 25, 2, "purchase"),
      ev(5, 8, 3, "view"), ev(6, 38, 3, "purchase"),
      // purchase BEFORE view: not a conversion
      ev(7, 50, 4, "purchase"), ev(8, 60, 4, "view"),
      // view only: not a conversion
      ev(9, 70, 5, "view"))
    val out = EventAnalytics.conversionLatency(d).collect()
    out should have length 1
    val r = out.head
    r.getAs[Long]("n_converted") shouldBe 3L
    // ranks over {600e6, 1200e6, 1800e6}: p25 rk1, p50 rk2, p75 rk3
    r.getAs[Long]("p25_latency_us") shouldBe 600000000L
    r.getAs[Long]("p50_latency_us") shouldBe 1200000000L
    r.getAs[Long]("p75_latency_us") shouldBe 1800000000L
  }

  test("stickiness: DAU/WAU by the explode identity; hand-checked window") {
    // user 1 active days 1,2,3; user 2 active day 3 only (window 2)
    val d = df(schema,
      ev(1, 1440, 1), ev(2, 2880, 1), ev(3, 4320, 1),
      ev(4, 4320, 2))
    val out = EventAnalytics.stickiness(d, windowDays = 2)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
         r.getAs[Long]("stickiness_permille"))).toMap
    // day2: dau 1, wau(days1-2) 1 -> 1000
    out("1970-01-02") shouldBe ((1L, 1L, 1000L))
    out("1970-01-03") shouldBe ((1L, 1L, 1000L))
    // day4: dau 2 (users 1,2), wau(days3-4) 2 -> 1000
    out("1970-01-04") shouldBe ((2L, 2L, 1000L))
    // no spine day beyond the last activity day
    out.keySet.max shouldBe "1970-01-04"
    assertSameRows(EventAnalytics.stickiness(d, 2),
      EventAnalytics.stickiness(d.repartition(5), 2))
  }

  test("hourlyEnvelope: exact rank picks per (type, hour); sparse days drop") {
    // hour 0 of days 1..10 gets 1..10 events of type a:
    // ranks over {1..10}: p10 rank (10+9)div10=1 -> 1;
    // p50 rank (10+1)div2=5 -> 5; p90 rank (90+9)div10=9 -> 9
    def at(day: Int, minute: Long, id: Long, n: Int) =
      (0 until n).map(i => ev(id + i, day * 1440L + minute, 1, "a"))
    val rows = (1 to 10).flatMap(d => at(d, 0, d * 100L, d)) ++
      // hour 5 observed on only one day -> all three picks = that value
      at(3, 5 * 60L, 5000L, 4)
    val out = EventAnalytics.hourlyEnvelope(df(schema, rows: _*))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Int]("hod")) ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("p10"), r.getAs[Long]("p50"),
         r.getAs[Long]("p90"))).toMap
    out(("a", 0)) shouldBe ((10L, 1L, 5L, 9L))
    out(("a", 5)) shouldBe ((1L, 4L, 4L, 4L))
    assertSameRows(EventAnalytics.hourlyEnvelope(df(schema, rows: _*)),
      EventAnalytics.hourlyEnvelope(df(schema, rows: _*).repartition(7)))
  }

  test("newVsReturning: first-day split, multi-event days dedup, exact permille") {
    val d = df(schema,
      // day 1: users 1, 2 (user 1 twice — dedups to one active)
      ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 2),
      // day 2: user 1 returns, user 3 is new
      ev(4, 1440, 1), ev(5, 1450, 3),
      // day 3: all three return
      ev(6, 2880, 1), ev(7, 2890, 2), ev(8, 2900, 3))
    val out = EventAnalytics.newVsReturning(d)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
         r.getAs[Long]("n_returning"), r.getAs[Long]("new_permille"))).toMap
    out("1970-01-01") shouldBe ((2L, 2L, 0L, 1000L))
    out("1970-01-02") shouldBe ((2L, 1L, 1L, 500L))
    out("1970-01-03") shouldBe ((3L, 0L, 3L, 0L))
    assertSameRows(EventAnalytics.newVsReturning(d),
      EventAnalytics.newVsReturning(d.repartition(7)))
  }

  test("levelShift: flags the cliff day, exact permille, warmup excluded") {
    // window 2: days 1-4 have 10 events/day, days 5-6 have 25 —
    // day 5: recent {10,25}=35 vs prev {10,10}=20 -> +750 permille
    // day 6: recent {25,25}=50 vs prev {10,10}=20 -> +1500 permille
    def burst(day: Int, n: Int, base: Int) =
      (0 until n).map(i => ev((base + i).toLong, day * 1440L + i, 1, "a"))
    val rows = (1 to 4).flatMap(d => burst(d, 10, d * 100)) ++
      burst(5, 25, 900) ++ burst(6, 25, 2000)
    val out = EventAnalytics.levelShift(df(schema, rows: _*), window = 2,
        thresholdPermille = 500L)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("recent_total"), r.getAs[Long]("prev_total"),
         r.getAs[Long]("change_permille"))).toMap
    out.keySet shouldBe Set("1970-01-06", "1970-01-07") // days 5, 6 (epoch+d)
    out("1970-01-06") shouldBe ((35L, 20L, 750L))
    out("1970-01-07") shouldBe ((50L, 20L, 1500L))
    // steady series never alarms, and partitioning doesn't matter
    val steady = df(schema, (1 to 8).flatMap(d =>
      burst(d, 10, d * 100)): _*)
    EventAnalytics.levelShift(steady, window = 2).count() shouldBe 0L
    val big = df(schema, (1 to 200).map(i =>
      ev(i.toLong, (i % 20) * 1440L + i, 1, s"t${i % 2}")): _*)
    assertSameRows(
      EventAnalytics.levelShift(big, window = 3, thresholdPermille = 100),
      EventAnalytics.levelShift(big.repartition(7), window = 3,
        thresholdPermille = 100))
  }

  test("seasonalNaiveBacktest: exact MAE/bias/WAPE; unscored days dropped") {
    // daily counts via one event per count unit, minutes spread out.
    // days 1..7 have 1,2,3,4,5,6,7 events; day 8 has 10; day 9 has 20.
    // scored: day8 (forecast day1=1, err 9), day9 (forecast day2=2, err 18)
    def burst(day: Int, n: Int, base: Int) =
      (0 until n).map(i => ev((base + i).toLong, day * 1440L + i, 1, "a"))
    val rows = (1 to 7).flatMap(d => burst(d, d, d * 100)) ++
      burst(8, 10, 900) ++ burst(9, 20, 1000)
    val out = EventAnalytics.seasonalNaiveBacktest(df(schema, rows: _*),
        seasonDays = 7)
      .collect().head
    out.getAs[Long]("n_days_scored") shouldBe 2L
    out.getAs[Long]("total_abs_err") shouldBe 27L
    out.getAs[Long]("total_bias") shouldBe 27L
    out.getAs[Long]("total_actual") shouldBe 30L
    out.getAs[Long]("mae_milli") shouldBe 13500L
    out.getAs[Long]("wape_permille") shouldBe 900L
  }

  test("seasonalNaiveBacktest: per-type isolation and partitioning invariance") {
    val rows = (1 to 40).map(i =>
      ev(i.toLong, ((i / 2) % 10) * 1440L + i, 1, if (i % 2 == 0) "a" else "b"))
    val d = df(schema, rows: _*)
    val a = EventAnalytics.seasonalNaiveBacktest(d)
    val b = EventAnalytics.seasonalNaiveBacktest(d.repartition(7))
    assertSameRows(a, b)
    a.collect().map(_.getAs[String]("event_type")).toSet shouldBe Set("a", "b")
  }

  test("cadenceProfile: metronome user scores 1000, bursty user 0, short drops") {
    val d = df(schema,
      // user 1: perfect 10-minute timer -> iqr 0 -> regularity 1000
      ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 1), ev(4, 30, 1),
      // user 2: gaps 1m, 10m, 100m -> median 600e6, iqr clamps -> 0
      ev(5, 0, 2), ev(6, 1, 2), ev(7, 11, 2), ev(8, 111, 2),
      // user 3: one gap only -> below minGaps, excluded
      ev(9, 0, 3), ev(10, 5, 3))
    val out = EventAnalytics.cadenceProfile(d, minGaps = 3)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L).getAs[Long]("median_gap_us") shouldBe 600000000L
    out(1L).getAs[Long]("iqr_us") shouldBe 0L
    out(1L).getAs[Long]("regularity_permille") shouldBe 1000L
    out(2L).getAs[Long]("p25_gap_us") shouldBe 60000000L
    out(2L).getAs[Long]("median_gap_us") shouldBe 600000000L
    out(2L).getAs[Long]("p75_gap_us") shouldBe 6000000000L
    out(2L).getAs[Long]("regularity_permille") shouldBe 0L
  }

  test("cadenceProfile: rank conventions on even counts; invariance") {
    // 5 events -> 4 gaps: 1m, 2m, 3m, 10m (minutes 0,1,3,6,16)
    // median rank (4+1) div 2 = 2 -> 2m; p25 rank (4+3) div 4 = 1 -> 1m;
    // p75 rank (12+3) div 4 = 3 -> 3m; iqr = 2m
    val d = df(schema,
      ev(1, 0, 1), ev(2, 1, 1), ev(3, 3, 1), ev(4, 6, 1), ev(5, 16, 1))
    val out = EventAnalytics.cadenceProfile(d, minGaps = 3).collect().head
    out.getAs[Long]("median_gap_us") shouldBe 120000000L
    out.getAs[Long]("p25_gap_us") shouldBe 60000000L
    out.getAs[Long]("p75_gap_us") shouldBe 180000000L
    // regularity = 1000 - (120e6 * 1000) div 120e6 = 0
    out.getAs[Long]("regularity_permille") shouldBe 0L
    val big = df(schema, (1 to 60).map(i =>
      ev(i.toLong, (i * i % 97).toLong, i % 4L)): _*)
    assertSameRows(EventAnalytics.cadenceProfile(big, minGaps = 2),
      EventAnalytics.cadenceProfile(big.repartition(7), minGaps = 2))
  }

  test("decayedCounts: whole-half-life power-of-2 weights, anchored at max ts") {
    // half-life 1 day = 1440 minutes. Anchor = minute 4320 (day 3).
    // ages in whole half-lives: 0d->3, 1d->2, 2d->1, 3d->0
    // weights: 125000, 250000, 500000, 1000000
    val d = df(schema,
      ev(1, 0, 1, "a"), ev(2, 1440, 1, "a"),
      ev(3, 2880, 1, "a"), ev(4, 4320, 1, "a"),
      ev(5, 4320, 2, "b"))
    val out = EventAnalytics.decayedCounts(d, halfLifeDays = 1)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("decayed_units"),
         r.getAs[Long]("freshness_permille"))).toMap
    out("a") shouldBe ((4L, 1875000L, 468L)) // 1875000*1000 div 4000000
    out("b") shouldBe ((1L, 1000000L, 1000L)) // all within one half-life
  }

  test("decayedCounts: ancient events clamp to zero weight; invariance") {
    // 63+ half-lives at 1-day half-life: weight = 1000000 div 2^62 = 0
    val d = df(schema,
      ev(1, 0, 1, "a"), ev(2, 100L * 1440L, 1, "a"))
    val out = EventAnalytics.decayedCounts(d, halfLifeDays = 1)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("decayed_units")).toMap
    out("a") shouldBe 1000000L // only the anchor event survives
    val big = df(schema, (1 to 50).map(i =>
      ev(i.toLong, i * 700L, i % 3L, s"t${i % 4}")): _*)
    assertSameRows(EventAnalytics.decayedCounts(big, halfLifeDays = 1),
      EventAnalytics.decayedCounts(big.repartition(7), halfLifeDays = 1))
  }

  test("associationRules: hand-computed support/confidence/lift; session baskets") {
    // 4 sessions (users 1-4, one each): {a,b}, {a,b}, {a}, {b,c}
    // s(a)=3, s(b)=3, s(c)=1, s(ab)=2, n=4
    val d = df(schema,
      ev(1, 0, 1, "a"), ev(2, 1, 1, "b"),
      ev(3, 0, 2, "a"), ev(4, 1, 2, "b"), ev(5, 2, 2, "a"), // dup a dedups
      ev(6, 0, 3, "a"),
      ev(7, 0, 4, "b"), ev(8, 1, 4, "c"))
    val out = EventAnalytics.associationRules(d, minSupport = 1)
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) ->
        (r.getAs[Long]("support_sessions"), r.getAs[Long]("support_permille"),
         r.getAs[Long]("confidence_permille"), r.getAs[Long]("lift_permille")))
      .toMap
    // a->b: support 2/4=500pm, conf 2/3=666pm, lift 2*4*1000/(3*3)=888pm
    out(("a", "b")) shouldBe ((2L, 500L, 666L, 888L))
    out(("b", "a")) shouldBe ((2L, 500L, 666L, 888L))
    // b->c: conf 1/3=333pm, lift 1*4*1000/(3*1)=1333pm (positive assoc)
    out(("b", "c")) shouldBe ((1L, 250L, 333L, 1333L))
    out(("c", "b")) shouldBe ((1L, 250L, 1000L, 1333L))
    out.keySet should not contain (("a", "c")) // never co-occur
  }

  test("associationRules: a session gap splits the basket; invariance") {
    // same user, 40-minute gap: {a} and {b} are SEPARATE baskets
    val d = df(schema,
      ev(1, 0, 1, "a"), ev(2, 50, 1, "b"),
      ev(3, 0, 2, "a"), ev(4, 1, 2, "b"))
    val out = EventAnalytics.associationRules(d, minSupport = 1)
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) -> r.getAs[Long]("support_sessions"))
      .toMap
    out(("a", "b")) shouldBe 1L // only user 2's single session
    val big = df(schema, (1 to 60).map(i => ev(i.toLong, i.toLong, i % 5L,
      s"t${i % 3}")): _*)
    assertSameRows(EventAnalytics.associationRules(big, minSupport = 1),
      EventAnalytics.associationRules(big.repartition(7), minSupport = 1))
  }

  test("attribution: timestamp-tied last touches resolve by event_id; invariant") {
    val d = df(schema,
      // two touches tied at minute 95: ids 2 (click) and 3 (view) —
      // the remainder goes to id 3
      ev(1, 90, 1, "view"), ev(2, 95, 1, "click"), ev(3, 95, 1, "view"),
      ev(10, 100, 1, "purchase"))
    val out = EventAnalytics.attribution(d)
      .collect().map(r => r.getAs[String]("touch_type") ->
        r.getAs[Long]("credit_permille")).toMap
    out("view") shouldBe 667L
    out("click") shouldBe 333L
    val big = df(schema, (1 to 60).map(i => ev(i.toLong, i.toLong, i % 4L,
      if (i % 5 == 0) "purchase" else if (i % 2 == 0) "view" else "click")): _*)
    assertSameRows(EventAnalytics.attribution(big, lookbackMinutes = 20),
      EventAnalytics.attribution(big.repartition(7), lookbackMinutes = 20))
  }
test("survivalHazard: tenure weeks, right-censoring, reverse at-risk sums") {
    val day = 1440L // minutes
    val d = df(schema,
      ev(1, 0, 1), ev(2, 21 * day, 1),        // u1: tenure 3w, churned
      ev(3, 0, 2),                            // u2: tenure 0w, churned
      ev(4, 20 * day, 3), ev(5, 34 * day, 3)) // u3: tenure 2w, last event
                                              // IS the horizon: censored
    val out = EventAnalytics.survivalHazard(d)
      .select("tenure_w", "n_risk", "n_churned", "hazard_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    out shouldBe Array(
      (0L, 3L, 1L, 333L),  // everyone was at risk in week 0
      (2L, 2L, 0L, 0L),    // u3 ends here censored: at risk, no event
      (3L, 1L, 1L, 1000L))
  }

  test("survivalHazard: a user inside the churn gap is censored, not churned") {
    val day = 1440L
    val d = df(schema,
      ev(1, 0, 1), ev(2, 10 * day, 1),  // horizon - last = 4d < 7d gap
      ev(3, 0, 2), ev(4, 14 * day, 2))  // horizon row, censored too
    val out = EventAnalytics.survivalHazard(d)
      .select("tenure_w", "n_churned").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 0L, 2L -> 0L)
  }

  test("survivalHazard is invariant under input partitioning") {
    val rows = (1 to 200).map(i =>
      ev(i.toLong, (i % 40).toLong * 1440L * 2L, (i % 23).toLong))
    val d = df(schema, rows: _*)
    assertSameRows(EventAnalytics.survivalHazard(d),
      EventAnalytics.survivalHazard(d.repartition(7)))
  }
test("sessionWindows: exact-gap boundary MERGES, matching sessionize's strict >") {
    // measured, then pinned: session_window treats a window touching
    // the next start as overlapping, so both operators keep an
    // exactly-gap-apart event in the same session
    val d = df(schema,
      ev(1, 0, 1), ev(2, 30, 1),   // exactly the 30-minute gap apart
      ev(3, 45, 1))                // 15 min after the second
    val native = EventAnalytics.sessionWindows(d, gapMinutes = 30)
      .select("n_events").as[Long].collect().sorted.toSeq
    native shouldBe Seq(3L)
    val hand = EventAnalytics.sessionize(d, gapMinutes = 30)
      .select("n_events").as[Long].collect().sorted.toSeq
    hand shouldBe Seq(3L)
    // one minute past the gap splits both
    val d2 = df(schema, ev(1, 0, 1), ev(2, 31, 1))
    EventAnalytics.sessionWindows(d2, gapMinutes = 30)
      .count() shouldBe 2L
  }

  test("sessionWindows: window end is last event + gap; off-boundary data matches sessionize") {
    val d = df(schema,
      ev(1, 0, 1), ev(2, 10, 1), ev(3, 55, 1), // sessions: {0,10}, {55}
      ev(4, 7, 2))
    val out = EventAnalytics.sessionWindows(d, gapMinutes = 30)
      .selectExpr("user_id", "CAST(w_start AS LONG)",
        "CAST(w_end AS LONG)", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (1L, 0L, 10 * 60 + 1800L, 2L),       // end = last + 30 min
      (1L, 55 * 60, 55 * 60 + 1800L, 1L),
      (2L, 7 * 60, 7 * 60 + 1800L, 1L))
    val hand = EventAnalytics.sessionize(d, gapMinutes = 30)
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted.toSeq
    hand shouldBe Seq((1L, 1L), (1L, 2L), (2L, 1L))
  }

  test("sessionWindows is invariant under input partitioning") {
    val rows = (1 to 300).map(i =>
      ev(i.toLong, (i * 17 % 500).toLong, (i % 9).toLong))
    val d = df(schema, rows: _*)
    assertSameRows(EventAnalytics.sessionWindows(d),
      EventAnalytics.sessionWindows(d.repartition(7)))
  }

  test("cumulativeDistinct: news charged to first-seen bucket; running total is their prefix sum") {
    import spark.implicits._
    val d = Seq(("d1", "A"), ("d1", "A"), ("d1", "B"),
      ("d2", "B"), ("d2", "C")).toDF("day", "u")
    val out = EventAnalytics.cumulativeDistinct(d, "u", "day")
      .collect().map(r => r.getString(0) -> r).toMap
    out("d1").getLong(1) shouldBe 3L
    out("d1").getLong(2) shouldBe 2L
    out("d1").getLong(3) shouldBe 2L
    out("d1").getLong(4) shouldBe 2L
    out("d2").getLong(2) shouldBe 2L   // active: B and C
    out("d2").getLong(3) shouldBe 1L   // but only C is NEW
    out("d2").getLong(4) shouldBe 3L
  }

  test("cumulativeDistinct: final running total equals the global distinct count; nulls excluded") {
    import spark.implicits._
    val d = ((1 to 200).map(i => (s"d${i % 9}", Some((i * 13 % 37).toLong))) :+
      ("d0", None)).toDF("day", "u")
    val out = EventAnalytics.cumulativeDistinct(d, "u", "day")
    val last = out.orderBy(col("day").desc).select("cum_distinct")
      .as[Long].head()
    last shouldBe d.filter(col("u").isNotNull)
      .select(countDistinct("u")).as[Long].head()
    assertSameRows(out,
      EventAnalytics.cumulativeDistinct(d.repartition(7), "u", "day"))
  }

  // ev() timestamps are epoch-1970-based; the cutoff fixtures need 2024
  private val jan1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ev24(id: Long, minute: Long, user: Long,
                   typ: String = "click", value: Double = 1.0) =
    Row(id, new Timestamp(jan1 + minute * 60000L), user, typ, value, "{}")

  test("churnLabels: the leakage gate — nothing after the cutoff enters a feature") {
    val day = 24 * 60L
    val rows = Seq(
      ev24(1, 0, 1L, "view", 10.0), ev24(2, day, 1L, "click", 20.0),
      ev24(3, 3 * day + 5, 1L, "purchase", 999.0), // after cutoff: label-only
      ev24(4, day, 2L, "view", 5.0),               // user 2: silent after
      ev24(5, 4 * day, 3L, "view", 7.0))           // only after cutoff: excluded
    val out = EventAnalytics.churnLabels(df(schema, rows: _*),
      cutoff = "2024-01-04", horizonDays = 7).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    out.keySet shouldBe Set(1L, 2L)                // user 3 unknown at cutoff
    out(1L).getAs[Long]("n_events") shouldBe 2L    // the purchase NEVER counts
    out(1L).getAs[Long]("value_cents") shouldBe 3000L
    out(1L).getAs[Boolean]("churned") shouldBe false
    out(2L).getAs[Long]("n_events") shouldBe 1L
    out(2L).getAs[Boolean]("churned") shouldBe true
    out(2L).getAs[Long]("recency_days") shouldBe 2L  // last seen Jan 2
  }

  test("churnLabels: activity past the horizon does not rescue a churner") {
    val day = 24 * 60L
    val rows = Seq(ev24(1, 0, 1L), ev24(2, 15 * day, 1L)) // returns day 16
    val out = EventAnalytics.churnLabels(df(schema, rows: _*),
      cutoff = "2024-01-04", horizonDays = 7).collect().head
    out.getAs[Boolean]("churned") shouldBe true      // horizon ends Jan 11
  }

  test("slidingStats: every event lands in size/slide windows; straddling burst seen whole") {
    // two events 2 minutes apart straddling the 10:00 hour boundary
    val rows = Seq(ev(1, 599, 1L, "click", 2.0),   // 09:59
      ev(2, 601, 1L, "click", 3.0))                 // 10:01
    val out = EventAnalytics.slidingStats(df(schema, rows: _*))
      .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[Long]("n_events"), r.getAs[Long]("value_cents")))
    // each event appears in exactly 4 windows
    out.map(_._2).sum shouldBe 8L
    // at least one sliding window contains BOTH (tumbling hours split them)
    out.count(w => w._2 == 2L && w._3 == 500L) should be >= 1
    // window span is exactly one hour
    val r0 = EventAnalytics.slidingStats(df(schema, rows: _*)).collect().head
    (r0.getAs[java.sql.Timestamp]("window_end").getTime -
      r0.getAs[java.sql.Timestamp]("window_start").getTime) shouldBe 3600000L
    val again = EventAnalytics.slidingStats(df(schema, rows: _*).repartition(5))
      .collect().map(_.toSeq).toSet
    again shouldBe EventAnalytics.slidingStats(df(schema, rows: _*))
      .collect().map(_.toSeq).toSet
  }

  test("keyedDiversity: exact Simpson by hand at both extremes and between") {
    val rows =
      (0 until 6).map(i => ev(10 + i, i, 1L, "click")) ++        // monoculture
      Seq(ev(20, 0, 2L, "a"), ev(21, 1, 2L, "b"), ev(22, 2, 2L, "c")) ++
      Seq(ev(30, 0, 3L, "a"), ev(31, 1, 3L, "a"), ev(32, 2, 3L, "b"),
        ev(33, 3, 3L, "b")) ++                                   // 2+2 of 4
      Seq(ev(40, 0, 4L, "solo"))                                 // single event
    val out = EventAnalytics.keyedDiversity(df(schema, rows: _*))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    out(1L).getAs[Long]("diversity_permille") shouldBe 0L
    out(2L).getAs[Long]("diversity_permille") shouldBe 1000L
    // D = (2*1 + 2*1) / (4*3) = 4/12 -> 1000 - 333 = 667
    out(3L).getAs[Long]("diversity_permille") shouldBe 667L
    out(3L).getAs[Long]("n_types") shouldBe 2L
    out(4L).isNullAt(out(4L).fieldIndex("diversity_permille")) shouldBe true
    val again = EventAnalytics.keyedDiversity(
      df(schema, rows: _*).repartition(5)).collect()
      .map(r => r.getAs[Long]("user_id") -> r.toSeq).toMap
    again shouldBe out.map { case (k, r) => k -> r.toSeq }
  }

  test("frequentTrigrams: hand counts, overlap, and the dual support cut") {
    // user 1 loops view,click x3 -> trigrams v,c,v (x2) and c,v,c (x2)
    // user 2 repeats the same loop once more; user 3 is pure noise
    val u1 = Seq("view", "click", "view", "click", "view", "click")
      .zipWithIndex.map { case (t, i) => ev(10 + i, i, 1L, t) }
    val u2 = Seq("view", "click", "view", "click")
      .zipWithIndex.map { case (t, i) => ev(20 + i, i, 2L, t) }
    val u3 = Seq("purchase", "refund", "purchase")
      .zipWithIndex.map { case (t, i) => ev(30 + i, i, 3L, t) }
    val out = EventAnalytics.frequentTrigrams(
        df(schema, u1 ++ u2 ++ u3: _*), minCount = 3L, minUsers = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_users"))).toSet
    // v,c,v: u1 has 2, u2 has 1 -> 3 occ / 2 users (passes);
    // c,v,c: u1 has 2, u2 has 1 -> 3 occ / 2 users (passes);
    // p,r,p: 1 occ / 1 user (fails both cuts)
    out shouldBe Set(
      ("view", "click", "view", 3L, 2L),
      ("click", "view", "click", 3L, 2L))
  }

  test("frequentTrigrams: minUsers alone can veto a high-count motif") {
    // one bot user replays a motif 10 times; minUsers = 2 kills it
    val bot = (0 until 12).map(i =>
      ev(100 + i, i, 9L, Seq("a", "b", "c")(i % 3)))
    EventAnalytics.frequentTrigrams(df(schema, bot: _*),
      minCount = 3L, minUsers = 2L).count() shouldBe 0L
    EventAnalytics.frequentTrigrams(df(schema, bot: _*),
      minCount = 3L, minUsers = 1L).count() should be > 0L
  }

  test("frequentTrigrams: equal-timestamp events order by event_id; partition-invariant") {
    // all at minute 0 -- only the event_id tiebreak sequences them
    val rows = Seq(ev(3, 0, 1L, "c"), ev(1, 0, 1L, "a"), ev(2, 0, 1L, "b"),
      ev(13, 0, 2L, "c"), ev(11, 0, 2L, "a"), ev(12, 0, 2L, "b"))
    val out = EventAnalytics.frequentTrigrams(df(schema, rows: _*),
      minCount = 2L, minUsers = 2L).collect()
    out.length shouldBe 1
    (out.head.getString(0), out.head.getString(1), out.head.getString(2)) shouldBe
      (("a", "b", "c"))
    val again = EventAnalytics.frequentTrigrams(
      df(schema, rows: _*).repartition(5), minCount = 2L, minUsers = 2L)
      .collect()
    again.map(_.toSeq).toSet shouldBe out.map(_.toSeq).toSet
  }

  test("commonPaths: hand triples, distinct-user support vs raw volume") {
    // u1 fires A B A B A (a scripted loop): triples (A,B,A) x2,
    // (B,A,B) x1. u2 fires A B A once: (A,B,A) x1.
    val d = df(schema,
      ev(1, 0, 1, "A"), ev(2, 1, 1, "B"), ev(3, 2, 1, "A"),
      ev(4, 3, 1, "B"), ev(5, 4, 1, "A"),
      ev(6, 0, 2, "A"), ev(7, 1, 2, "B"), ev(8, 2, 2, "A"))
    val out = EventAnalytics.commonPaths(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    out shouldBe Array(
      ("A", "B", "A", 2L, 3L),  // reach 2 users, volume 3
      ("B", "A", "B", 1L, 1L))
  }

  test("commonPaths: topK cuts on the total order; users never cross-contaminate") {
    // u1: A->B->C; u2: X->Y->Z — no triple spans users
    val d = df(schema,
      ev(1, 0, 1, "A"), ev(2, 1, 1, "B"), ev(3, 2, 1, "C"),
      ev(4, 3, 2, "X"), ev(5, 4, 2, "Y"), ev(6, 5, 2, "Z"))
    val all = EventAnalytics.commonPaths(d).collect()
    all.map(r => (r.getString(0), r.getString(1), r.getString(2))) shouldBe
      Array(("A", "B", "C"), ("X", "Y", "Z"))  // ties broken by path asc
    EventAnalytics.commonPaths(d, topK = 1).collect()
      .map(_.getString(0)) shouldBe Array("A")
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.commonPaths(d, topK = 0)
  }

  test("commonPaths is invariant under input partitioning") {
    val rows = (1 to 60).map(i =>
      ev(i.toLong, i.toLong, (i % 5).toLong, s"t${i * 7 % 4}"))
    val d = df(schema, rows: _*)
    val a = EventAnalytics.commonPaths(d).collect().map(_.toSeq)
    val b = EventAnalytics.commonPaths(d.repartition(7)).collect()
      .map(_.toSeq)
    a shouldBe b
  }

  private def day(d: Long, id: Long, n: Int): Seq[Row] =
    (0 until n).map(i => ev(id * 100 + i, d * 1440 + i, user = 1L))

  test("dailyAutocorrelation: alternating series by hand — r1 negative, r2 positive") {
    // daily counts [2,0,2,0,2] (days 1 and 3 zero-filled by the
    // calendar explode): n=5, S=6, Q=12 -> den = 25*12 - 5*36 = 120.
    // lag1: P=0, A=B=4, m=4 -> num = -5*6*8 + 4*36 = -96 -> acf -0.8
    // lag2: P=8, A=B=4, m=3 -> num = 200 - 240 + 108 = 68 -> 68/120
    val d = df(schema, (day(0, 1, 2) ++ day(2, 3, 2) ++ day(4, 5, 2)): _*)
    val out = EventAnalytics.dailyAutocorrelation(d, maxLag = 2)
      .orderBy(col("lag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    out.toSeq shouldBe Seq(
      (1L, 4L, -96L, 120L, -96.0 / 120.0),
      (2L, 3L, 68L, 120L, 68.0 / 120.0))
  }

  test("dailyAutocorrelation: a missing calendar day is a zero, not a skipped row") {
    // counts [2, _, 2] with day 1 absent from the data: zero-filled,
    // n=3 S=4 Q=8 -> den = 9*8 - 3*16 = 24; lag1 pairs (2,0),(0,2):
    // num = 0 - 12*4 + 2*16 = -16; lag2 pairs (2,2): num = 36 - 48 +
    // 16 = 4. If absent days were dropped the two loaded days would
    // sit at adjacent indices and lag 2 would have no pairs at all.
    val d = df(schema, (day(0, 1, 2) ++ day(2, 3, 2)): _*)
    val out = EventAnalytics.dailyAutocorrelation(d, maxLag = 2)
      .orderBy(col("lag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1L, 2L, -16L, 24L), (2L, 1L, 4L, 24L))
  }

  test("dailyAutocorrelation: constant series yields NULL acf, never NaN; guards; invariance") {
    val flat = df(schema, (day(0, 1, 3) ++ day(1, 2, 3) ++ day(2, 3, 3)): _*)
    val rows = EventAnalytics.dailyAutocorrelation(flat, maxLag = 1).collect()
    rows should have size 1
    rows.head.getLong(3) shouldBe 0L       // den_scaled
    rows.head.isNullAt(4) shouldBe true    // acf NULL on zero variance
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.dailyAutocorrelation(flat, maxLag = 0)
    val d = df(schema, (0 until 40).flatMap(i =>
      day(i.toLong % 11, i.toLong + 10, 1 + i % 3)): _*)
    val a = EventAnalytics.dailyAutocorrelation(d, maxLag = 3)
      .orderBy(col("lag")).collect().map(_.toSeq)
    val b = EventAnalytics.dailyAutocorrelation(d.repartition(7), maxLag = 3)
      .orderBy(col("lag")).collect().map(_.toSeq)
    a shouldBe b
  }

  test("behaviorSurprisal: hand add-one Markov bits — common hop 0 bits, rare hop scored, loner NULL") {
    // u1 fires A->A nine times (10 'a' events), u2 fires the one rare
    // A->B hop, u3 has a single event. Model: c(A,A)=9, c(A,B)=1,
    // c(A.)=10, K=2 types. bits(A->A) = floor(log2(12 div 10)) = 0;
    // bits(A->B) = floor(log2(12 div 2)) = 2.
    val rows = (1L to 10L).map(i => ev(i, i, 1, "a")) ++
      Seq(ev(11, 1, 2, "a"), ev(12, 2, 2, "b"), ev(13, 1, 3, "a"))
    val d = df(schema, rows: _*)
    val out = EventAnalytics.behaviorSurprisal(d).orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    out shouldBe Seq(
      (1L, 9L, Some(0L), Some(0L), Some(0L)),
      (2L, 1L, Some(2L), Some(2L), Some(2000L)),
      (3L, 0L, None, None, None))
  }

  test("behaviorSurprisal: equal-timestamp hops stay deterministic; partitioning-invariant") {
    // two same-minute events per user — the (ts, event_id) tiebreak
    // decides the transition direction identically under any layout
    val rows = (1L to 40L).flatMap(u => Seq(
      ev(u * 10, 5, u, if (u % 2 == 0) "x" else "y"),
      ev(u * 10 + 1, 5, u, "z"),
      ev(u * 10 + 2, 9, u, if (u % 3 == 0) "x" else "y")))
    val d = df(schema, rows: _*)
    assertSameRows(EventAnalytics.behaviorSurprisal(d),
      EventAnalytics.behaviorSurprisal(d.repartition(7)))
  }
}
