package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def corpus(rows: (Long, String)*) =
    df(schema, rows.map { case (i, t) => Row(i, t) }: _*)

  test("strips lines at the df threshold, keeps rarer and unique lines") {
    val d = corpus(
      1L -> "HEADER\nalpha one\nFOOTER",
      2L -> "HEADER\nbeta two\nshared pair\nFOOTER",
      3L -> "HEADER\ngamma three\nshared pair\nFOOTER")
    val out = Boilerplate.removeCommonLines(d, "id", "text", minDocs = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    // HEADER/FOOTER df=3 → removed; 'shared pair' df=2 → kept
    out shouldBe Array(
      (1L, 3L, 1L, "alpha one"),
      (2L, 4L, 2L, "beta two\nshared pair"),
      (3L, 4L, 2L, "gamma three\nshared pair"))
  }

  test("within-doc repetition counts once for df; copies live or die together") {
    val d = corpus(
      1L -> "promo\npromo\ncontent a",
      2L -> "promo\ncontent b",
      3L -> "content c\ncontent c")
    // df(promo)=2 → at minDocs=2 removed everywhere, BOTH copies in doc 1;
    // df('content c')=1 → both copies survive, order intact
    val out = Boilerplate.removeCommonLines(d, "id", "text", minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    out shouldBe Array(
      (1L, 3L, 1L, "content a"),
      (2L, 2L, 1L, "content b"),
      (3L, 2L, 2L, "content c\ncontent c"))
  }

  test("a doc of pure chrome survives as an empty row, never dropped") {
    val d = corpus(
      1L -> "HEADER", 2L -> "HEADER", 3L -> "HEADER",
      4L -> "HEADER\nreal content")
    val out = Boilerplate.removeCommonLines(d, "id", "text", minDocs = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    out shouldBe Array(
      (1L, 1L, 0L, ""), (2L, 1L, 0L, ""), (3L, 1L, 0L, ""),
      (4L, 2L, 1L, "real content"))
  }

  test("custom separator is honored and regex-quoted") {
    val d = corpus(
      1L -> "chrome|keep me", 2L -> "chrome|mine", 3L -> "chrome|yours")
    val out = Boilerplate.removeCommonLines(d, "id", "text",
        minDocs = 3, sep = "|")
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    out.map(_._4) shouldBe Array("keep me", "mine", "yours")
  }

  test("commonLines audits the flagged set with document frequencies") {
    val d = corpus(
      1L -> "HEADER\nx\nFOOTER", 2L -> "HEADER\ny", 3L -> "HEADER\nFOOTER")
    val out = Boilerplate.commonLines(d, "id", "text", minDocs = 2)
      .orderBy("line").as[(String, Long)].collect()
    out shouldBe Array(("FOOTER", 2L), ("HEADER", 3L))
  }
}
