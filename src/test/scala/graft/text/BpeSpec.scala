package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The hand-computable corpus from the BPE paper (Sennrich et al.
    * 2016, §3.2): low×5, lower×2, newest×6, widest×3. */
  private def sennrich = docs(
    1L -> Seq.fill(5)("low").mkString(" "),
    2L -> Seq.fill(2)("lower").mkString(" "),
    3L -> Seq.fill(6)("newest").mkString(" "),
    4L -> Seq.fill(3)("widest").mkString(" "))

  test("trainBpe learns the paper's merge sequence") {
    // counts at step 1: (e,s)=(s,t)=(t,</w>)=9 — the lexicographic
    // tie-break picks (e,s), then the chain collapses as in the paper.
    Bpe.trainBpe(sennrich, 5) shouldBe Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
  }

  test("applyMerges encodes an unseen word with learned subwords") {
    val merges = Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    Bpe.applyMerges("lowest", merges) shouldBe List("low", "est</w>")
    Bpe.applyMerges("low", merges) shouldBe List("low", "</w>")
    Bpe.applyMerges("widest", merges) shouldBe List("w", "i", "d", "est</w>")
  }

  test("encodeTokenCounts sums per-word subword counts per doc") {
    val merges = Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val out = Bpe.encodeTokenCounts(docs(
        1L -> "low widest",   // [low </w>]=2 + [w i d est</w>]=4
        2L -> "lowest"),      // [low est</w>]=2
        merges)
      .orderBy("doc_id").collect()
    out(0).getLong(1) shouldBe 6L
    out(1).getLong(1) shouldBe 2L
  }

  test("trainBpe stops early when every word is fully merged") {
    // "ab": (a,b) then (ab,</w>) exhaust the pairs — 2 merges, not 10.
    Bpe.trainBpe(docs(1L -> "ab"), 10) shouldBe Seq(
      ("a", "b"), ("ab", "</w>"))
  }

  test("pairCounts weights pairs by word frequency") {
    val pc = Bpe.pairCounts(Bpe.initialSymbols(Bpe.wordCounts(sennrich)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    pc(("e", "s")) shouldBe 9L   // newest 6 + widest 3
    pc(("l", "o")) shouldBe 7L   // low 5 + lower 2
    pc(("t", "</w>")) shouldBe 9L
  }
}
