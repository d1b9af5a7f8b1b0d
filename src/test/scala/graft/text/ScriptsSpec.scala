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
}
