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

  import org.apache.spark.sql.functions._

  test("snmPairs: adjacent records pair, records beyond the window don't") {
    val recs = Seq(
      (1L, "alpha engine"), (2L, "alpha enginz"), // dist 1, adjacent sorted
      (3L, "beta rotor"), (4L, "gamma shaft"),
      (5L, "zeta coupling"))
      .toDF("rec_id", "name")
    val out = FuzzyMatch.snmPairs(recs, "rec_id", "name",
        Seq(col("name")), window = 2, maxDist = 2)
      .select("rec_a", "rec_b", "dist")
      .as[(Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 2L, 1L))
  }

  test("snmPairs: forward pass misses an early-position typo; the reversed pass rescues it") {
    // Corrupt the FIRST character: "melon crate" -> "xelon crate".
    // Sorted forward the twin lands at the far end of the alphabet
    // (window 2 can't bridge the m..x gap across the padding rows);
    // sorted by reversed name the pair shares the entire suffix and
    // is adjacent.
    val recs = (Seq(
      (1L, "melon crate"), (2L, "xelon crate")) ++
      (3L to 12L).map(i => (i, s"pad${"%02d".format(i)} filler")))
      .toDF("rec_id", "name")
    val fwd = FuzzyMatch.snmPairs(recs, "rec_id", "name",
        Seq(col("name")), window = 2, maxDist = 2)
      .select("rec_a", "rec_b").as[(Long, Long)].collect().toSet
    fwd should not contain ((1L, 2L))
    val multi = FuzzyMatch.snmPairs(recs, "rec_id", "name",
        Seq(col("name"), reverse(col("name"))), window = 2, maxDist = 2)
      .select("rec_a", "rec_b").as[(Long, Long)].collect().toSet
    multi should contain ((1L, 2L))
  }

  test("snmPairs: pairs are normalized, deduped across passes, and verified") {
    val recs = Seq(
      (10L, "same text"), (3L, "same text"),     // dist 0, both passes find it
      (7L, "far away completely"), (8L, "totally unrelated words"))
      .toDF("rec_id", "name")
    val out = FuzzyMatch.snmPairs(recs, "rec_id", "name",
        Seq(col("name"), reverse(col("name"))), window = 4, maxDist = 1)
      .select("rec_a", "rec_b", "dist").as[(Long, Long, Long)].collect()
    // exactly once despite two passes x several offsets; rec_a < rec_b
    out.toSeq shouldBe Seq((3L, 10L, 0L))
  }

  test("snmPairs is invariant under input partitioning") {
    val recs = (1 to 80).map(i =>
      (i.toLong, s"record name ${"%03d".format(i / 2 * 2)} v${i % 2}"))
      .toDF("rec_id", "name")
    assertSameRows(
      FuzzyMatch.snmPairs(recs, "rec_id", "name",
        Seq(col("name")), window = 3, maxDist = 2),
      FuzzyMatch.snmPairs(recs.repartition(7), "rec_id", "name",
        Seq(col("name")), window = 3, maxDist = 2))
  }
}
