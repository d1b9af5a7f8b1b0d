package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MergeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("date", StringType),
    StructField("symbol", StringType),
    StructField("data_source", StringType),
    StructField("close", DoubleType),
    StructField("row_id", LongType)))

  private def bars(rows: (String, String, String, Double, Long)*) =
    df(schema, rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)): _*)

  test("unionSources is ragged-tolerant (A1)") {
    import spark.implicits._
    val a = Seq(("2024-01-01", "A", 1.0)).toDF("date", "symbol", "close")
    val b = Seq(("2024-01-02", "B", 2.0, 5L)).toDF("date", "symbol", "close", "volume")
    val u = Merge.unionSources(Seq(a, b))
    u.columns.toSet shouldBe Set("date", "symbol", "close", "volume")
    u.count() shouldBe 2
    u.filter(col("symbol") === "A").collect()(0).isNullAt(3) shouldBe true
  }

  test("dedupKeepFirst keeps exactly the priority-minimal row per key (A2)") {
    val in = bars(
      ("2024-01-01", "A", "av", 10.0, 2L),
      ("2024-01-01", "A", "av", 11.0, 1L), // survivor: lowest row_id
      ("2024-01-01", "A", "yh", 12.0, 3L),
      ("2024-01-02", "A", "av", 13.0, 4L))
    val out = Merge.dedupKeepFirst(in, Seq("date", "symbol", "data_source"), Seq(col("row_id")))
    out.count() shouldBe 3
    out.filter(col("data_source") === "av" && col("date") === "2024-01-01")
      .collect()(0).getAs[Double]("close") shouldBe 11.0
  }

  test("dedup is idempotent: applying twice equals applying once") {
    val in = bars(
      ("2024-01-01", "A", "av", 10.0, 2L),
      ("2024-01-01", "A", "av", 11.0, 1L),
      ("2024-01-02", "B", "yh", 12.0, 3L))
    val once = Merge.dedupKeepFirst(in, Seq("date", "symbol", "data_source"), Seq(col("row_id")))
    val twice = Merge.dedupKeepFirst(once, Seq("date", "symbol", "data_source"), Seq(col("row_id")))
    assertSameRows(twice, once)
  }

  test("dedup result is independent of input partitioning/order") {
    val in = bars(
      ("2024-01-01", "A", "av", 10.0, 2L),
      ("2024-01-01", "A", "av", 11.0, 1L),
      ("2024-01-01", "A", "av", 9.0, 3L))
    val shuffled = in.orderBy(col("close")) // different physical order
    val a = Merge.dedupKeepFirst(in, Seq("date", "symbol", "data_source"), Seq(col("row_id")))
    val b = Merge.dedupKeepFirst(shuffled.repartition(7), Seq("date", "symbol", "data_source"), Seq(col("row_id")))
    assertSameRows(a, b)
  }

  test("diffByKey labels added/removed/changed/unchanged incl. null-safe values") {
    import spark.implicits._
    val before = Seq(
      (1L, Option(10.0)), (2L, Option(20.0)), (3L, None), (4L, Option(40.0)))
      .toDF("id", "v")
    val after = Seq(
      (1L, Option(10.0)),  // unchanged
      (2L, Option(99.0)),  // changed
      (3L, None),          // unchanged (NULL <=> NULL)
      (5L, Option(50.0)))  // added; id 4 removed
      .toDF("id", "v")
    val out = Merge.diffByKey(before, after, Seq("id"))
      .as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added")
  }

  test("mergeSources = union + dedup + optional sort (full stage)") {
    val av = bars(("2024-01-01", "A", "av", 1.0, 1L))
    val yh = bars(("2024-01-01", "A", "yh", 2.0, 2L), ("2024-01-01", "A", "yh", 3.0, 3L))
    val out = Merge.mergeSources(Seq(av, yh), priority = Seq(col("row_id")), sorted = true)
    out.count() shouldBe 2
    out.select("close").collect().map(_.getDouble(0)).toSet shouldBe Set(1.0, 2.0)
  }
}
