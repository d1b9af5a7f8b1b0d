package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "attr", "v")

  private def log(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("k", "version", "op", "attr", "v")

  test("applyCdc: last writer wins, tombstones delete, inserts land, replays are no-ops") {
    val changes = log(
      (2L, 1L, "U", "b2", 21.0),  // superseded by v2
      (2L, 2L, "U", "b3", 22.0),
      (2L, 2L, "U", "b3", 22.0),  // exact replay: same winner
      (3L, 1L, "D", "c", 30.0),   // tombstone
      (4L, 1L, "I", "d", 40.0))   // new key
    val out = Cdc.applyCdc(target, changes, Seq("k"), "version")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (1L, "a", 10.0),   // untouched
      (2L, "b3", 22.0),  // latest update
      (4L, "d", 40.0))   // insert; key 3 deleted
  }

  test("applyCdc: equal-version tie resolves by op order (U beats D), stated") {
    val changes = log(
      (1L, 5L, "U", "a2", 11.0),
      (1L, 5L, "D", "a", 10.0))
    val out = Cdc.applyCdc(target, changes, Seq("k"), "version")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    out.toSeq shouldBe Seq((1L, "a2", 11.0), (2L, "b", 20.0), (3L, "c", 30.0))
    // a delete that WINS carries a later version (the real-CDC shape)
    val out2 = Cdc.applyCdc(target,
      changes.unionByName(log((1L, 6L, "D", "a2", 11.0))),
      Seq("k"), "version")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    out2.toSeq shouldBe Seq((2L, "b", 20.0), (3L, "c", 30.0))
  }

  test("applyCdc is invariant under input partitioning") {
    val changes = log((1 to 60).map(i =>
      ((i % 7).toLong, (i % 5).toLong, if (i % 11 == 0) "D" else "U",
        s"x$i", i.toDouble)): _*)
    assertSameRows(
      Cdc.applyCdc(target, changes, Seq("k"), "version"),
      Cdc.applyCdc(target.repartition(5), changes.repartition(7),
        Seq("k"), "version"))
  }

  test("applyCdc rejects a log missing payload columns, loudly") {
    val bad = Seq((1L, 1L, "U")).toDF("k", "version", "op")
    an[IllegalArgumentException] should be thrownBy
      Cdc.applyCdc(target, bad, Seq("k"), "version")
  }
}
