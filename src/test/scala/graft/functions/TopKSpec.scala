package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def topRows(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKFunctions.topKBy(col("v"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("s.v").as("v"), col("s.id").as("id"))

  test("topKBy equals the window row_number idiom on random-ish data") {
    val d = (1 to 500).map(i =>
      (s"g${i % 7}", (i * 37 % 101).toLong, i.toLong)).toDF("g", "v", "id")
    val agg = topRows(d, 5)
      .as[(String, Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id"))
    val win = d.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5).select("g", "rank", "v", "id")
      .as[(String, Long, Long, Long)].collect().toSet
    agg shouldBe win
  }

  test("topKBy: ties break by id ascending; k beyond group size returns all") {
    val d = Seq(("a", 9L, 4L), ("a", 9L, 2L), ("a", 7L, 1L))
      .toDF("g", "v", "id")
    val out = topRows(d, 10)
      .select("rank", "v", "id").as[(Long, Long, Long)].collect().toSeq
    out shouldBe Seq((1L, 9L, 2L), (2L, 9L, 4L), (3L, 7L, 1L))
  }

  test("topKBy skips null values and ids (SQL aggregate semantics)") {
    val d = Seq(("a", Some(5L), Some(1L)), ("a", None, Some(2L)),
        ("a", Some(8L), None), ("a", Some(3L), Some(4L)))
      .toDF("g", "v", "id")
    val out = topRows(d, 2)
      .select("v", "id").as[(Long, Long)].collect().toSeq
    out shouldBe Seq((5L, 1L), (3L, 4L))
  }

  test("topKBy is exact under any partitioning (partial/merge path)") {
    val d = (1 to 2000).map(i =>
      (s"g${i % 3}", (i * 131 % 997).toLong, i.toLong)).toDF("g", "v", "id")
    assertSameRows(topRows(d, 7), topRows(d.repartition(13), 7))
  }

  test("topKBy plans as ObjectHashAggregate with NO sort of the input rows") {
    val d = (1 to 100).map(i => (s"g${i % 4}", i.toLong, i.toLong))
      .toDF("g", "v", "id")
    val out = d.groupBy("g")
      .agg(TopKFunctions.topKBy(col("v"), col("id"), 3).as("top"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    // the window idiom's defining cost — a per-group Sort of every
    // input row — must be absent from the aggregate plan
    plan should not include "Sort ["
  }
}
