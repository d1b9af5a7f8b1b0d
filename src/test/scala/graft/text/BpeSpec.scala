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

  /** Naive reference trainer: recount every pair from scratch each
    * iteration — obviously correct, quadratically slow. Pins the
    * incremental-delta loop in [[Bpe.trainFromTypes]]. */
  private def naiveTrain(types: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var state = types.map { case (w, f) =>
      (w.split("").toList :+ Bpe.EndOfWord, f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = state.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(_ -> f)
      }.groupBy(_._1).map { case (p, l) => p -> l.map(_._2).sum }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        state = state.map { case (s, f) => (Bpe.mergeOnce(s, best._1, best._2), f) }
        i += 1
      }
    }
    merges.result()
  }

  test("trainFromTypes matches a naive full-recount trainer on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val types = (1 to (5 + rnd.nextInt(20))).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }.toSeq
      val n = 3 + rnd.nextInt(15)
      withClue(s"trial $trial types=$types merges=$n: ") {
        Bpe.trainFromTypes(types, n) shouldBe naiveTrain(types, n)
      }
    }
  }

  test("rankEncode equals applyMerges replay on random merge lists") {
    val rnd = new scala.util.Random(7)
    // trained lists (realistic chains) AND fully arbitrary lists (the
    // watermark equivalence holds for ANY list, including pairs whose
    // parts never co-occur and duplicate pairs)
    for (trial <- 1 to 30) {
      val types = (1 to 12).map { _ =>
        val w = (1 to (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (1L + rnd.nextInt(5))
      }
      val trained = Bpe.trainFromTypes(
        types.groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }.toSeq, 10)
      val arbitrary = (1 to 8).map { _ =>
        def sym() = (1 to (1 + rnd.nextInt(2))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (sym(), if (rnd.nextBoolean()) sym() else Bpe.EndOfWord)
      }
      for (merges <- Seq(trained, arbitrary, trained ++ arbitrary)) {
        val ranks = Bpe.mergeRanks(merges)
        for (_ <- 1 to 10) {
          val w = (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
          withClue(s"trial $trial word=$w merges=$merges: ") {
            Bpe.rankEncode(w, ranks) shouldBe Bpe.applyMerges(w, merges)
          }
        }
      }
    }
  }

  test("a pathological megasymbol word costs heap, never stack") {
    // a 50k-char [a-z0-9]+ run (hash/base64 blob) in one document:
    // head-recursive merging would StackOverflow an executor here.
    val blob = "a" * 50000
    val merges = Seq(("a", "a"), ("aa", "aa"))
    // greedy no-remerge: 50000 a's -> 25000 aa's -> 12500 aaaa's, +</w>
    Bpe.applyMerges(blob, merges).length shouldBe 12501
    Bpe.rankEncode(blob, Bpe.mergeRanks(merges)).length shouldBe 12501
    Bpe.trainFromTypes(Seq(blob -> 3L), 2) shouldBe merges
  }

  test("fertilityByLang: hand-computed per-lang rates, zero-word lang yields NULL rates") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // under bpeStaticMerges: "the" -> 1 token (t|h -> th, e|</w> ->
    // e</w>, th|e</w> -> the</w>), "and" -> 1, "xy" -> 2 (x, y</w>)
    val d = Seq(
      (1L, "the and", "en"),   // 2 words, 7 chars, 2 BPE tokens
      (2L, "xy", "en"),        // 1 word,  2 chars, 2 BPE tokens
      (3L, "", "zz"))          // 0 words, 0 chars, 0 tokens
      .toDF("doc_id", "text", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.fertilityByLang(df, graft.OracleSql.bpeStaticMerges)
        .orderBy(col("lang"))
        .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq
    val out = run(d)
    out shouldBe Seq(
      // en: 2 docs, 3 words, 9 chars, 4 tokens ->
      //     fertility 4000 div 3 = 1333, chars/token 9000 div 4 = 2250
      ("en", 2L, 3L, 9L, 4L, Some(1333L), Some(2250L)),
      // zz: zero words AND zero tokens -> both rates NULL, doc counted
      ("zz", 1L, 0L, 0L, 0L, None, None))
    // partitioning invariance (the memoized encode is per-partition
    // state; the rates must not see it)
    run(d.repartition(7)) shouldBe out
  }

  test("encodeTokenCounts cost is independent of merge-list length") {
    // not a wall-clock assertion (jitter): a 50k-entry merge list in
    // which only 5 entries ever apply must still encode correctly —
    // the rank map makes inapplicable entries free.
    val real = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val padding = (1 to 50000).map(i => (s"zz$i", s"qq$i"))
    val out = Bpe.encodeTokenCounts(docs(1L -> "low widest", 2L -> "lowest"),
        real ++ padding)
      .orderBy("doc_id").collect()
    out(0).getLong(1) shouldBe 6L
    out(1).getLong(1) shouldBe 2L
  }
}
