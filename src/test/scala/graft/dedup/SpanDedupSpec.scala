package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    df(schema, rows.map(r => Row(r._1, r._2)): _*)

  test("a shared 8-token span surfaces between exactly the docs that carry it") {
    val span = "one two three four five six seven eight"
    val d = docs(
      1L -> s"intro words here $span and a tail",
      2L -> s"totally different opening $span closing remarks now",
      3L -> "nothing in common with the others at all whatsoever today")
    val out = SpanDedup.sharedSpans(d, k = 3, minSpanTokens = 5, maxDf = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // run = 8 - 3 + 1 = 6 grams on one diagonal; span = 6 + 2 = 8
    out shouldBe Seq((1L, 2L, 8L, 6L))
  }

  test("internal repetition in one doc does not inflate the pair's span") {
    val d = docs(
      1L -> "x y z x y z x y z",  // the gram 'x y z' repeats internally
      2L -> "a b c x y z d e f")
    val out = SpanDedup.sharedSpans(d, k = 3, minSpanTokens = 3, maxDf = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // each occurrence in doc 1 matches doc 2's single 'x y z' on a
    // DIFFERENT diagonal: three 1-gram runs, max span stays 3
    out shouldBe Seq((1L, 2L, 3L, 3L))
  }

  test("the df cap drops corpus-chrome grams (the candidate-volume governor)") {
    val chrome = "standard footer text shared by every single page here"
    val d = docs(1L -> chrome, 2L -> chrome, 3L -> chrome)
    // df = 3 > maxDf = 2: all grams are chrome, no pairs survive
    SpanDedup.sharedSpans(d, k = 3, minSpanTokens = 3, maxDf = 2)
      .count() shouldBe 0L
    // raising the cap reveals the (deliberate) full-duplicate pairs
    SpanDedup.sharedSpans(d, k = 3, minSpanTokens = 9, maxDf = 3)
      .count() shouldBe 3L
  }

  test("removeSharedSpans: the later doc loses the span, the first keeps it") {
    val span = "one two three four five six seven eight"
    val d = docs(
      1L -> s"intro words here $span and a tail",
      2L -> s"totally different opening $span closing remarks now")
    val out = SpanDedup.removeSharedSpans(d, k = 3, minSpanTokens = 5, maxDf = 10)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    out shouldBe Seq(
      (1L, 14L, 0L, s"intro words here $span and a tail"), // keep-first
      (2L, 14L, 8L, "totally different opening closing remarks now"))
  }

  test("removeSharedSpans: a full duplicate survives as an empty row, never vanishes") {
    val text = "alpha beta gamma delta epsilon"
    val d = docs(1L -> text, 2L -> text)
    val out = SpanDedup.removeSharedSpans(d, k = 3, minSpanTokens = 5, maxDf = 10)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    out shouldBe Seq((1L, 5L, 0L, text), (2L, 5L, 5L, ""))
  }

  test("removeSharedSpans: a doc victimized by two pairs loses the union of spans") {
    val x = "one two three four five"
    val y = "six seven eight nine ten"
    val d = docs(
      1L -> s"zz yy $x ww",
      2L -> s"qq $y rr",
      3L -> s"$x bridge words $y")
    val out = SpanDedup.removeSharedSpans(d, k = 3, minSpanTokens = 5, maxDf = 10)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    out shouldBe Seq(
      (1L, 8L, 0L, s"zz yy $x ww"),
      (2L, 7L, 0L, s"qq $y rr"),
      (3L, 12L, 10L, "bridge words"))
  }

  test("result is invariant under input partitioning") {
    val span = "alpha beta gamma delta epsilon zeta"
    val base = docs(
      1L -> s"p q r $span s t",
      2L -> s"u v $span w x y z",
      3L -> s"m n o p q r s t u v w")
    val a = SpanDedup.sharedSpans(base, k = 3, minSpanTokens = 4, maxDf = 10)
    val b = SpanDedup.sharedSpans(base.repartition(7), k = 3,
      minSpanTokens = 4, maxDf = 10)
    assertSameRows(a, b)
  }
}
