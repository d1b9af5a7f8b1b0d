package graft.etl

import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("typoPairs finds substitution and insertion pairs, never distance 2") {
    val d = Seq("cat bat cats", "dog dogs cat", "fish").toDF("t")
    val out = FuzzyMatch.typoPairs(d, "t")
      .orderBy("word_a", "word_b")
      .as[(String, String, Long, Long)].collect()
    out shouldBe Array(
      ("bat", "cat", 1L, 2L),    // substitution; cat appears twice
      ("cat", "cats", 2L, 1L),   // one-char insertion
      ("dog", "dogs", 1L, 1L))
    // bat/cats (distance 2) and fish (no neighbor) are absent
  }

  test("typoPairs emits each pair once despite multiple shared variants") {
    // "ab" and "b": share variant "b" (deletion of 'a') — and only it,
    // but "aa"/"a" style pairs share two deletion paths to "a"
    val d = Seq("aa a").toDF("t")
    val out = FuzzyMatch.typoPairs(d, "t")
      .as[(String, String, Long, Long)].collect()
    out shouldBe Array(("a", "aa", 1L, 1L))
  }
}
