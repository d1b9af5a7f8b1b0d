package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", Some(10L)), (2L, "b", Some(20L)), (3L, "c", Some(30L)),
    (5L, null.asInstanceOf[String], None: Option[Long])
  ).toDF("id", "name", "score")

  private def newDf = Seq(
    (2L, "b", Some(20L)),               // unchanged
    (3L, "X", Some(31L)),               // both columns changed
    (4L, "d", Some(40L)),               // added
    (5L, null.asInstanceOf[String], Some(7L)) // NULL -> value on score only
  ).toDF("id", "name", "score")

  test("diff: statuses and changed-column sets, nulls compared null-safely") {
    val out = Diff.diff(oldDf, newDf, Seq("id"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, "removed", ""),
      (2L, "unchanged", ""),
      (3L, "changed", "name,score"),
      (4L, "added", ""),
      (5L, "changed", "score"))
  }

  test("diff compares only shared non-key columns (schema drift tolerated)") {
    val wider = newDf.withColumn("extra", lit(1))
    val out = Diff.diff(oldDf, wider, Seq("id"))
      .filter(col("id") === 2L).as[(Long, String, String)].collect()
    out shouldBe Array((2L, "unchanged", ""))
  }

  test("diffSummary counts rows per status and per changed column") {
    val s = Diff.diffSummary(oldDf, newDf, Seq("id"))
      .as[(String, String, Long)].collect().toSet
    s shouldBe Set(
      ("removed", "*", 1L), ("unchanged", "*", 1L), ("added", "*", 1L),
      ("changed", "*", 2L), ("changed", "name", 1L), ("changed", "score", 2L))
  }

  test("diff is partitioning-invariant") {
    assertSameRows(
      Diff.diff(oldDf, newDf, Seq("id")),
      Diff.diff(oldDf.repartition(7), newDf.repartition(3), Seq("id")))
  }
}
