package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // user 1 changes tier x -> x -> y -> x (the middle duplicate must
  // collapse); user 2 never changes.
  private def feed = Seq(
    (1L, ts(1), "x"), (1L, ts(2), "x"), (1L, ts(3), "y"), (1L, ts(4), "x"),
    (2L, ts(1), "z")
  ).toDF("user_id", "ts", "tier")

  test("scd2: runs collapse, intervals chain, last interval open") {
    val dim = Scd.scd2(feed, Seq("user_id"), Seq("tier"), "ts")
      .select("user_id", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    dim shouldBe Array(
      (1L, "x", ts(1), Some(ts(3)), false),
      (1L, "y", ts(3), Some(ts(4)), false),
      (1L, "x", ts(4), None, true),
      (2L, "z", ts(1), None, true))
  }

  test("scd2: all-NULL first attribute still opens a run; NULL runs collapse") {
    val d = Seq[(Long, Timestamp, Option[String])](
      (1L, ts(1), None), (1L, ts(2), None), (1L, ts(3), Some("a"))
    ).toDF("user_id", "ts", "tier")
    val dim = Scd.scd2(d, Seq("user_id"), Seq("tier"), "ts")
      .select("user_id", "tier", "valid_from", "valid_to")
      .as[(Long, Option[String], Timestamp, Option[Timestamp])]
      .collect().sortBy(_._3.getTime)
    dim shouldBe Array(
      (1L, None, ts(1), Some(ts(3))),
      (1L, Some("a"), ts(3), None))
  }

  test("scd2 is partitioning-invariant and plans a single Exchange") {
    val a = Scd.scd2(feed, Seq("user_id"), Seq("tier"), "ts")
    val b = Scd.scd2(feed.repartition(7), Seq("user_id"), Seq("tier"), "ts")
    assertSameRows(a, b)
    // both window passes ride one exchange+sort: the start-filter
    // preserves (key) partitioning and (ts, attrs) order
    val plan = a.queryExecution.executedPlan.toString
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("snapshotAt: half-open boundaries, open intervals cover the future") {
    val dim = Scd.scd2(feed, Seq("user_id"), Seq("tier"), "ts")
    def tierAt(min: Int): Map[Long, String] =
      Scd.snapshotAt(dim, lit(ts(min)))
        .select("user_id", "tier").as[(Long, String)].collect().toMap
    tierAt(2) shouldBe Map(1L -> "x", 2L -> "z")
    tierAt(3) shouldBe Map(1L -> "y", 2L -> "z") // valid_from inclusive
    tierAt(59) shouldBe Map(1L -> "x", 2L -> "z") // open interval
    // before all history: nothing valid
    Scd.snapshotAt(dim, lit(Timestamp.valueOf("2023-12-31 00:00:00")))
      .count() shouldBe 0L
  }
}
