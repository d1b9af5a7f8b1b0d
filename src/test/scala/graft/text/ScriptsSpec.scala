package graft.text

import graft.SparkSpec

class ScriptsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(text: String): (Long, String, Option[Long]) = {
    val r = Scripts.scriptProfile(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_scripted", "dominant", "dom_permille")
      .as[(Long, String, Option[Long])].head()
    r
  }

  test("pure-script texts are fully confident") {
    profile("hello world") shouldBe ((10L, "latin", Some(1000L)))
    profile("привет мир") shouldBe ((9L, "cyrillic", Some(1000L)))
    profile("你好世界") shouldBe ((4L, "cjk", Some(1000L)))
    profile("안녕하세요") shouldBe ((5L, "hangul", Some(1000L)))
  }

  test("mixture: dominant by count, exact integer permille") {
    // 6 latin + 4 cyrillic letters -> latin, 6000/10 = 600
    profile("abcdef гдеж") shouldBe ((10L, "latin", Some(600L)))
    // 2 latin + 4 cjk -> cjk dominant
    profile("ab 你好世界") shouldBe ((6L, "cjk", Some(666L)))
  }

  test("ties break by the fixed family order") {
    // 2 latin, 2 cyrillic: latin earlier in the order
    profile("ab гд") shouldBe ((4L, "latin", Some(500L)))
  }

  test("no counted letters at all -> none/NULL") {
    profile("123 456 !!") shouldBe ((0L, "none", None))
  }

  test("accented Latin counts as latin") {
    profile("café naïve") shouldBe ((9L, "latin", Some(1000L)))
  }

  test("spoofScan: homoglyph token flagged, pure foreign script is NOT a spoof") {
    val d = Seq(
      1L -> "pay pаypal now",      // Cyrillic а inside a Latin token
      2L -> "go micrοsoft site",   // Greek omicron inside Latin
      3L -> "СТОП sign here", // pure-Cyrillic word: not mixed
      4L -> "plain ascii text").toDF("doc_id", "text")
    val out = Scripts.spoofScan(d)
      .select("doc_id", "n_tokens", "n_mixed_tokens", "first_mixed_token",
        "n_confusable_chars", "skeleton_changed", "spoof")
      .as[(Long, Long, Long, Option[String], Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    out(1L) shouldBe ((3L, 1L, Some("pаypal"), 1L, true, true))
    out(2L) shouldBe ((3L, 1L, Some("micrοsoft"), 1L, true, true))
    // СТОП: С/Т/О are confusables (П is not), skeleton changes, but the
    // token is single-script — foreign text, not a spoof
    out(3L) shouldBe ((3L, 0L, None, 3L, true, false))
    out(4L) shouldBe ((3L, 0L, None, 0L, false, false))
  }

  test("spoofScan skeleton fold maps every confusable to its Latin twin") {
    // the full table round-trips: a string of every FROM char folds to
    // exactly the TO string, and the fold is idempotent
    val d = Seq(1L -> Scripts.skeletonFrom).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{col, translate}
    val folded = d.select(translate(col("text"),
      Scripts.skeletonFrom, Scripts.skeletonTo).as("f")).as[String].head()
    folded shouldBe Scripts.skeletonTo
    Scripts.skeletonFrom.length shouldBe Scripts.skeletonTo.length
  }
}
