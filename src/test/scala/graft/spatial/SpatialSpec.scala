package graft.spatial

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ts: (Long, Long, Long)*) =
    ts.toDF("id", "x_e6", "y_e6")

  test("proximityJoin: exact radius boundary — <= kept, just-over dropped") {
    val a = pts((1L, 0L, 0L))
    val b = pts((10L, 100L, 0L), (11L, 101L, 0L), (12L, 60L, 80L))
    val out = Spatial.proximityJoin(a, b, radius = 100L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    out.keySet shouldBe Set(10L, 12L)   // 100 on the dot and 3-4-5 at 100
    out(10L) shouldBe 10000L
    out(12L) shouldBe 10000L
  }

  test("proximityJoin: pairs straddling a cell boundary are found (the 9-key reason)") {
    // radius 100: x=99 is in cell 0, x=101 in cell 1; distance 2
    val a = pts((1L, 99L, 50L))
    val b = pts((2L, 101L, 50L))
    Spatial.proximityJoin(a, b, 100L).count() shouldBe 1L
  }

  test("proximityJoin: negative coordinates use uniform floor cells") {
    // straddling the origin: -40 (cell -1) vs 40 (cell 0), distance 80
    val a = pts((1L, -40L, -40L))
    val b = pts((2L, 40L, 40L), (3L, -240L, -40L))
    val found = Spatial.proximityJoin(a, b, 120L)
      .select("b_id").as[Long].collect().toSet
    found shouldBe Set(2L)   // id 3 at dx=200 is beyond radius
  }

  test("proximityJoin: coincident points pair at dist2 = 0; no duplicate candidates") {
    val a = pts((1L, 7L, -7L), (2L, 7L, -7L))
    val out = Spatial.proximityJoin(a, a, 50L)
      .filter(col("a_id") < col("b_id")).collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 0L
  }

  test("proximityJoin agrees with brute force on a pseudo-random field") {
    val field = pts((1 to 200).map(i =>
      (i.toLong, (i * 7919L % 2001) - 1000, (i * 104729L % 2001) - 1000)): _*)
    val brute = field.as("a").join(field.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        ((col("a.x_e6") - col("b.x_e6")) * (col("a.x_e6") - col("b.x_e6")) +
          (col("a.y_e6") - col("b.y_e6")) * (col("a.y_e6") - col("b.y_e6")))
          .as("dist2"))
      .filter(col("dist2") <= 150L * 150L)
    val cells = Spatial.proximityJoin(field, field, 150L)
      .filter(col("a_id") < col("b_id"))
    assertSameRows(cells, brute)
  }

  test("proximityJoin is invariant under input partitioning") {
    val field = pts((1 to 150).map(i =>
      (i.toLong, (i * 31L % 997) - 500, (i * 57L % 997) - 500)): _*)
    assertSameRows(
      Spatial.proximityJoin(field, field, 200L),
      Spatial.proximityJoin(field.repartition(7), field.repartition(5), 200L))
  }
}
