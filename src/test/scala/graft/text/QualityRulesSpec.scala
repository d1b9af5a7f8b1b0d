package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  // A passing document: >= 30 tokens, mean length in [3, 4.6], few
  // digits, diverse, contains stopwords.
  private val good = ("the quick brown fox jumps over the lazy dog and then " +
    "runs far away into deep green woods where small birds sing old songs " +
    "about long summer days full of light").toLowerCase

  private def docs = Seq(
    (1L, good),                                     // passes every rule
    (2L, "short text only"),                        // fails len_ok
    (3L, good.replaceAll("\\w+", "12345")),         // all digits
    (4L, Seq.fill(40)("the").mkString(" ")),        // fails diversity
    (5L, ""),                                       // tokenless
    (6L, good + " " + good)                         // still passes
  ).toDF("doc_id", "text")

  test("applyRules keeps exactly ruleReport's keep=true docs, original columns") {
    val direct = QualityRules.applyRules(docs)
    val viaReport = QualityRules.ruleReport(docs)
      .filter(col("keep")).select(col("doc_id").as("kid"))
    val expected = docs.join(viaReport, col("doc_id") === col("kid"))
      .drop("kid")
    assertSameRows(direct, expected)
    direct.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 6L)
    direct.columns shouldBe docs.columns
  }

  test("applyRules is a single-scan filter: no join in the physical plan") {
    val plan = QualityRules.applyRules(docs).queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Exchange"
  }

  test("per-rule failures land on the right rule in the report") {
    val r = QualityRules.ruleReport(docs)
      .select("doc_id", "len_ok", "digit_ok", "rep_ok", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    r(2L)._2 shouldBe false // too short
    r(3L)._3 shouldBe false // digit ratio
    r(4L)._4 shouldBe false // repetition / diversity
    r(1L)._5 shouldBe true
    r.contains(5L) shouldBe false // tokenless doc never reaches the report
  }

  test("ruleAblation: unique-failure accounting by hand on the shared fixture") {
    // doc 2 fails len_ok UNIQUELY-ish? "short text only": 3 tokens ->
    // len fails; stop_ok has no stopwords ('only' is not in the union
    // list?) — derive expectations from the report itself, then assert
    // the ablation matches that derivation exactly (the ablation must
    // be a pure rollup of the report, no separate rule logic).
    val rpt = QualityRules.ruleReport(docs)
      .select("doc_id", "n_tokens", "len_ok", "word_len_ok", "digit_ok",
        "rep_ok", "stop_ok")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    val rules = QualityRules.ruleNames
    def flag(row: (Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean),
             i: Int): Boolean = i match {
      case 0 => row._3; case 1 => row._4; case 2 => row._5
      case 3 => row._6; case _ => row._7
    }
    val expected = rules.zipWithIndex.map { case (r, i) =>
      val fails = rpt.filter(row => !flag(row, i))
      val unique = fails.filter(row =>
        rules.indices.filterNot(_ == i).forall(j => flag(row, j)))
      (r, fails.size.toLong, unique.size.toLong, unique.map(_._2).sum)
    }.sortBy(_._1)
    val got = QualityRules.ruleAblation(docs).orderBy("rule")
      .as[(String, Long, Long, Long)].collect().toSeq
    got shouldBe expected
    // sanity on the fixture: at least one rule has unique kills and
    // at least one failing rule's kills are fully shadowed elsewhere
    got.map(_._3).sum should be > 0L
    assertSameRows(QualityRules.ruleAblation(docs),
      QualityRules.ruleAblation(docs.repartition(5)))
  }
}
