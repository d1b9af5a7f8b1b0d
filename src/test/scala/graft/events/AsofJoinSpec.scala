package graft.events

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def row(id: Long, user: Long, minute: Long, v: Double) =
    Row(id, user, new Timestamp(base + minute * 60000L), v)

  test("each left row gets the most recent right row at or before its time") {
    val left = df(schema, row(101, 1, 10, 0), row(102, 1, 30, 0), row(103, 2, 5, 0))
    val right = df(schema, row(1, 1, 5, 1.0), row(2, 1, 20, 2.0), row(3, 2, 50, 3.0))
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("id", "v"))
      .select("id", "asof_id", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (101L, Some(1L), Some(1.0)),  // view@5 <= 10
      (102L, Some(2L), Some(2.0)),  // view@20 <= 30
      (103L, None, None))           // user 2 has no prior right row
  }

  test("a right row at exactly the left time matches (inclusive)") {
    val left = df(schema, row(101, 1, 10, 0))
    val right = df(schema, row(1, 1, 10, 7.0))
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    out shouldBe Some(7.0)
  }

  test("NULL fields of the matched right row stay NULL (no cross-row stitching)") {
    val nullable = StructType(schema.map(f =>
      if (f.name == "v") f.copy(dataType = DoubleType, nullable = true) else f))
    val left = df(schema, row(101, 1, 30, 0))
    // matched row (id 2, @20) has v=NULL; an OLDER row (id 1, @5) has
    // v=9.0 — per-column carry would wrongly fill 9.0 into asof_v
    val right = df(nullable,
      Row(1L, 1L, new Timestamp(base + 5 * 60000L), 9.0),
      Row(2L, 1L, new Timestamp(base + 20 * 60000L), null))
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("id", "v"))
      .select("asof_id", "asof_v")
      .as[(Option[Long], Option[Double])].head()
    out shouldBe ((Some(2L), None))
  }

  test("forward as-of picks the earliest right row at or after the left time") {
    val left = df(schema, row(101, 1, 10, 0), row(102, 1, 60, 0), row(103, 2, 5, 0))
    val right = df(schema, row(1, 1, 5, 1.0), row(2, 1, 20, 2.0), row(3, 2, 1, 3.0))
    val out = AsofJoin.asofForward(left, right, Seq("user_id"), "ts", Seq("id"))
      .select("id", "asof_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (101L, Some(2L)),  // next right row after 10 is @20
      (102L, None),      // nothing after 60
      (103L, None))      // user 2's only right row is BEFORE 5
  }

  test("forward as-of is inclusive at exactly-equal times") {
    val left = df(schema, row(101, 1, 10, 0))
    val right = df(schema, row(1, 1, 10, 7.0))
    val out = AsofJoin.asofForward(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    out shouldBe Some(7.0)
  }

  test("nearest as-of picks the closer side and breaks ties to the past") {
    val left = df(schema,
      row(101, 1, 10, 0),   // back @8 (d=2) beats fwd @30 (d=20)
      row(102, 1, 25, 0),   // fwd @30 (d=5) beats back @8 (d=17)
      row(103, 1, 19, 0),   // EXACT tie: back @8 (d=11) vs fwd @30 (d=11) -> past
      row(104, 2, 10, 0),   // only a forward row exists
      row(105, 3, 10, 0))   // no right rows at all
    val right = df(schema,
      row(1, 1, 8, 0), row(2, 1, 30, 0), row(3, 2, 99, 0))
    val out = AsofJoin.asofNearest(left, right, Seq("user_id"), "ts", Seq("id"))
      .select("id", "asof_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (101L, Some(1L)), (102L, Some(2L)), (103L, Some(1L)),
      (104L, Some(3L)), (105L, None))
  }

  test("nearest as-of at distance zero returns the simultaneous row") {
    val left = df(schema, row(101, 1, 10, 0))
    val right = df(schema, row(1, 1, 10, 7.0), row(2, 1, 11, 8.0))
    val out = AsofJoin.asofNearest(left, right, Seq("user_id"), "ts", Seq("id", "v"))
      .select("asof_id", "asof_v")
      .as[(Option[Long], Option[Double])].head()
    out shouldBe ((Some(1L), Some(7.0)))
  }

  test("left columns pass through untouched; matches stay within key groups") {
    val left = df(schema, row(101, 1, 10, 42.0), row(102, 2, 10, 43.0))
    val right = df(schema, row(1, 2, 5, 9.0))
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("id", "v", "asof_v")
      .as[(Long, Double, Option[Double])].collect().sortBy(_._1)
    out.toSeq shouldBe Seq((101L, 42.0, None), (102L, 43.0, Some(9.0)))
  }
}
