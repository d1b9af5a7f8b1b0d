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

  private def sx(words: String*): Seq[(String, String)] = {
    import org.apache.spark.sql.functions.col
    words.toDF("w")
      .select(col("w"), FuzzyMatch.soundexKey(col("w")).as("c"))
      .as[(String, String)].collect().toSeq
  }

  test("soundexKey: the textbook vectors (Knuth TAOCP 3 + census set)") {
    sx("Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
       "Honeyman", "Euler", "Gauss", "Hilbert", "Knuth", "Lloyd",
       "Lukasiewicz", "Washington", "Jackson")
      .map(_._2) shouldBe Seq(
      "R163", "R163", // sound-alikes conflate across 3 edits
      "A261", "A261", // s,c collapse ACROSS the deleted h
      "T522",         // y separates like a vowel; adjacent c,z collapse
      "P236",         // first letter's own code collapses with f
      "H555", "E460", "G200", "H416", "K530", "L300", "L222",
      "W252", "J250")
  }

  test("soundexKey: vowel separation vs h/w collapse (the rule that distinguishes them)") {
    // b-o-b: same code across a VOWEL counts twice -> B100? no:
    // Bobby = B,o,b,b,y: the second b is separated from B by a vowel
    // so it IS coded (then bb collapses) -> B100
    sx("Bobby").head._2 shouldBe "B100"
    // 'grass' (ss adjacent, collapse once) vs 'grasas' (vowel between)
    sx("grass").head._2 shouldBe "G620"
    sx("grasas").head._2 shouldBe "G622"
  }

  test("soundexKey: short codes pad, vowel-initial words keep their first code digit") {
    sx("a").head._2 shouldBe "A000"
    sx("Lee").head._2 shouldBe "L000"
    sx("Ashcraft").head._2 should startWith("A2") // the s survives the drop rule
  }

  test("soundexKey: case-insensitive, strips non-letters, empty/non-letter -> NULL") {
    sx("ROBERT", "robert").map(_._2).distinct shouldBe Seq("R163")
    sx("O'Brien").head._2 shouldBe sx("OBrien").head._2
    import org.apache.spark.sql.functions.col
    val out = Seq("123", "", "!?").toDF("w")
      .select(FuzzyMatch.soundexKey(col("w"))).collect()
    all(out.map(_.isNullAt(0))) shouldBe true
  }

  test("soundexConflation: vowel-doubled variants conflate with their originals") {
    val d = Seq("the table row", "the taable roow").toDF("text")
    val out = FuzzyMatch.soundexConflation(d, "text")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    out(sx("table").head._2) shouldBe ((2L, 2L, "taable,table"))
    out(sx("row").head._2) shouldBe ((2L, 2L, "roow,row"))
    out(sx("the").head._2) shouldBe ((1L, 2L, "the")) // same form twice
  }
}
