package graft.events

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def ts(minute: Long) = new Timestamp(base + minute * 60000L)

  private val ptSchema = StructType(Seq(
    StructField("pid", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))
  private val ivSchema = StructType(Seq(
    StructField("iid", LongType, nullable = false),
    StructField("s", TimestampType, nullable = false),
    StructField("e", TimestampType, nullable = false)))

  test("pointInInterval matches BETWEEN semantics incl. bounds and overlaps") {
    val points = df(ptSchema,
      Row(1L, ts(0)), Row(2L, ts(30)), Row(3L, ts(60)), Row(4L, ts(200)))
    val ivs = df(ivSchema,
      Row(10L, ts(0), ts(30)),     // contains 1 (start bound), 2 (end bound)
      Row(11L, ts(25), ts(70)),    // contains 2, 3 — overlapping interval
      Row(12L, ts(100), ts(150)))  // empty
    val out = RangeJoin.pointInInterval(points, ivs, "ts", "s", "e",
        bucketWidthSec = 600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    out shouldBe Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
  }

  test("inverted intervals (end < start) are dropped, not exploded") {
    val points = df(ptSchema, Row(1L, ts(30)))
    val ivs = df(ivSchema,
      Row(10L, ts(0), ts(60)),    // valid, contains the point
      Row(11L, ts(500), ts(-500))) // inverted: BETWEEN matches nothing
    val out = RangeJoin.pointInInterval(points, ivs, "ts", "s", "e",
        bucketWidthSec = 60)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    out shouldBe Set((1L, 10L))
  }

  test("an interval spanning more than maxBucketsPerInterval fails fast") {
    val points = df(ptSchema, Row(1L, ts(30)))
    val ivs = df(ivSchema, Row(10L, ts(0), ts(10000)))
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, ivs, "ts", "s", "e",
        bucketWidthSec = 60, maxBucketsPerInterval = 100).collect()
    }
    // the executor-side assert rides up wrapped; scan the cause chain
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("\n")
    msgs should include("100 buckets")
  }

  test("result is bucket-width invariant (each pair meets exactly once)") {
    val points = df(ptSchema, (1L to 40L).map(i => Row(i, ts(i * 7))): _*)
    val ivs = df(ivSchema,
      Row(1L, ts(10), ts(100)), Row(2L, ts(50), ts(60)), Row(3L, ts(90), ts(300)))
    def run(w: Long) =
      RangeJoin.pointInInterval(points, ivs, "ts", "s", "e", bucketWidthSec = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val narrow = run(60)     // intervals span many buckets
    val wide = run(86400)    // everything in one bucket
    narrow shouldBe wide
    narrow.distinct.size shouldBe narrow.size // no duplicate pairs
  }
}
