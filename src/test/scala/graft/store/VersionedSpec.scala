package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("part", StringType, nullable = false)))

  private def rows(rs: (Long, Double, String)*) =
    df(schema, rs.map { case (i, v, p) => Row(i, v, p) }: _*)

  private def freshTable() = Files.createTempDirectory("versioned").toString + "/t"

  private def d1 = rows((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b"))

  test("versioned round-trip and sequential numbering") {
    val t = freshTable()
    Versioned.commit(spark, t, d1, "part", Nil) shouldBe 1
    assertSameRows(Versioned.readVersion(spark, t, 1), d1)
    Versioned.currentVersion(spark, t) shouldBe 1
  }

  test("a MERGE commit rewrites only touched partitions; old versions stay intact") {
    val t = freshTable()
    Versioned.commit(spark, t, d1, "part", Nil)
    val aFilesBefore = new java.io.File(s"$t/data/part=a/__dv=1").listFiles()
      .map(f => f.getName -> f.lastModified).toMap

    // touch only partition b: update id 3, insert id 4
    val staging = rows((3L, 30.0, "b"), (4L, 40.0, "b"))
    Versioned.commit(spark, t, staging, "part", keys = Seq("id")) shouldBe 2

    // v2 merged view
    assertSameRows(Versioned.readVersion(spark, t, 2),
      rows((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 30.0, "b"), (4L, 40.0, "b")))
    // v1 is byte-for-byte the same files, untouched (snapshot isolation)
    assertSameRows(Versioned.readVersion(spark, t, 1), d1)
    val aFilesAfter = new java.io.File(s"$t/data/part=a/__dv=1").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    aFilesAfter shouldBe aFilesBefore
    // partition a was NOT rewritten for v2: no __dv=2 dir exists under it
    new java.io.File(s"$t/data/part=a/__dv=2").exists() shouldBe false
  }

  test("data without a manifest pointer is invisible (crash = garbage, not corruption)") {
    val t = freshTable()
    Versioned.commit(spark, t, d1, "part", Nil)
    // simulate a crashed v2: data written, manifest never published
    rows((9L, 9.0, "a")).drop("part")
      .write.parquet(s"$t/data/part=a/__dv=2")
    Versioned.currentVersion(spark, t) shouldBe 1
    assertSameRows(Versioned.readVersion(spark, t, 1), d1)
    // the next successful commit supersedes the orphan dir
    Versioned.commit(spark, t, rows((9L, 9.0, "b")), "part", Seq("id")) shouldBe 2
    assertSameRows(Versioned.readVersion(spark, t, 2),
      rows((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b"), (9L, 9.0, "b")))
  }
}
