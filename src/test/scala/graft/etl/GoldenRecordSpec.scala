package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("e", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("email", StringType, nullable = true),
    StructField("phone", StringType, nullable = true)))

  private def rows(rs: (Long, Long, String, String)*) =
    df(schema, rs.map { case (e, v, m, p) => Row(e, v, m, p) }: _*)

  test("fields survive independently: the composite spans source rows") {
    val d = rows(
      (1L, 1L, "a@x", "111"),
      (1L, 2L, "b@x", null),   // latest email, but phone is a partial update
      (1L, 3L, null, null),    // latest row carries nothing
      (2L, 1L, null, "222"))
    val out = GoldenRecord.goldenRecords(d, "e", "v", Seq("email", "phone"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), r.getLong(3)))).toMap
    // entity 1: email from v2, phone from v1 — last-writer-wins would
    // have erased the phone (or kept the stale email)
    out(1L) shouldBe ((Some("b@x"), Some("111"), 3L))
    // entity 2: email never present -> NULL, not fabricated
    out(2L) shouldBe ((None, Some("222"), 1L))
  }

  test("equal versions break to the larger value, deterministically") {
    val d = rows((1L, 5L, "a@x", null), (1L, 5L, "z@x", null))
    GoldenRecord.goldenRecords(d, "e", "v", Seq("email"))
      .collect().head.getString(1) shouldBe "z@x"
  }

  test("goldenRecords is invariant under input partitioning") {
    val d = rows((1 to 120).map(i =>
      ((i % 7).toLong, (i % 13).toLong,
        if (i % 3 == 0) null else s"m$i",
        if (i % 5 == 0) null else s"p$i")): _*)
    assertSameRows(
      GoldenRecord.goldenRecords(d, "e", "v", Seq("email", "phone")),
      GoldenRecord.goldenRecords(d.repartition(7), "e", "v",
        Seq("email", "phone")))
  }
}
