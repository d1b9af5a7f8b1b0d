package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("v", LongType, nullable = true)))

  private def data(rows: (String, java.lang.Long)*) =
    df(schema, rows.map { case (g, v) => Row(g, v) }: _*)

  test("fills nulls with the group's LOWER median; observed rows untouched") {
    // group a non-null values sorted: 10 20 30 40 -> lower median at
    // position (4+1) div 2 = 2 -> 20 (never the interpolated 25)
    val d = data("a" -> 10L, "a" -> 20L, "a" -> 30L, "a" -> 40L,
      "a" -> null, "b" -> 7L, "b" -> null)
    val out = Impute.imputeMedian(d, Seq("g"), "v")
      .as[(String, Option[Long], Long, Boolean)].collect()
    out.filter(r => r._1 == "a" && r._2.isEmpty).toSeq shouldBe
      Seq(("a", None, 20L, true))
    out.filter(r => r._1 == "b" && r._2.isEmpty).toSeq shouldBe
      Seq(("b", None, 7L, true))
    // observed rows: filled == observed, never flagged
    out.filter(_._2.isDefined).foreach { r =>
      r._3 shouldBe r._2.get
      r._4 shouldBe false
    }
  }

  test("odd count takes the exact middle; all-null group stays null unflagged") {
    val d = data("a" -> 5L, "a" -> 100L, "a" -> 6L, "a" -> null,
      "c" -> null, "c" -> null)
    val rows = Impute.imputeMedian(d, Seq("g"), "v").collect()
    val filledA = rows.filter(r => r.getString(0) == "a" && r.isNullAt(1)).head
    filledA.getLong(2) shouldBe 6L // median of {5, 6, 100}
    val cRows = rows.filter(_.getString(0) == "c")
    cRows.foreach { r =>
      r.isNullAt(2) shouldBe true    // nothing to impute FROM
      r.getBoolean(3) shouldBe false // and it is not claimed as imputed
    }
  }

  test("imputeMedian is invariant under input partitioning") {
    val d = data((1 to 90).map(i =>
      (s"g${i % 4}", if (i % 7 == 0) null
       else java.lang.Long.valueOf(i * 13 % 50))): _*)
    assertSameRows(Impute.imputeMedian(d, Seq("g"), "v"),
      Impute.imputeMedian(d.repartition(7), Seq("g"), "v"))
  }
}
