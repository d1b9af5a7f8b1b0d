package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("compressibilityScores: repetition collapses, varied text doesn't; empty is NULL") {
    import spark.implicits._
    val rep = "lorem ipsum dolor sit amet " * 200             // pure template
    val varied = (1 to 200).map(i =>
      s"w${i * 7919 % 9973}x${i * i % 911}").mkString(" ")    // high variety
    val d = docs(1L -> rep, 2L -> varied, 3L -> "")
    val out = TextAnalysis.compressibilityScores(d)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    out(1L)._4.get should be < 50L                 // template: < 5% of raw
    out(2L)._4.get should be > (out(1L)._4.get * 5)
    out(3L)._2 shouldBe 0L
    out(3L)._4 shouldBe None                       // no fabricated ratio
    // long-range repetition the shingle window can't see: half+half copy
    val half = varied.take(varied.length / 2)
    val doubled = TextAnalysis.compressibilityScores(docs(9L -> (half + half)))
      .as[(Long, Long, Long, Option[Long])].head()
    val single = TextAnalysis.compressibilityScores(docs(8L -> half))
      .as[(Long, Long, Long, Option[Long])].head()
    doubled._3.toDouble should be < (single._3 * 1.2) // 2nd half ~ free
  }

  test("compressibilityScores is deterministic across partitionings and codegen modes") {
    val d = docs((1 to 40).map(i =>
      i.toLong -> s"payload ${i % 5} ${"z" * (i % 17)} tail$i"): _*)
    assertSameRows(TextAnalysis.compressibilityScores(d),
      TextAnalysis.compressibilityScores(d.repartition(7)))
    val base = TextAnalysis.compressibilityScores(d).collect().toSeq.sortBy(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      TextAnalysis.compressibilityScores(d).collect().toSeq
        .sortBy(_.getLong(0)) shouldBe base
    }
  }

  test("featureHash: indices inside [0, dim), linear in token counts, mass bounded") {
    import spark.implicits._
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon alpha beta gamma delta epsilon")
    val out = TextAnalysis.featureHash(d, dim = 8)
      .as[(Long, Int, Long)].collect()
    all(out.map(_._2)) should (be >= 0 and be < 8)
    val v1 = out.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    val v2 = out.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    v2 shouldBe v1.map { case (i, v) => i -> v * 2 } // doubled text = 2x vector
    v1.values.map(math.abs).sum should be <= 5L       // <= one unit per token
    all(out.map(_._3)) should not be 0L
  }

  test("featureHash matches a driver-side replay of the hash arithmetic") {
    import spark.implicits._
    val words = Seq("red", "green", "blue", "cyan", "red")
    val d = docs(1L -> words.mkString(" "))
    // replay: md5 first-14-hex mod P, idx = h mod dim, sign bit (h div dim) % 2
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(t: String): Long = {
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16) % 1000000007L
    }
    val expect = words.map(h).groupBy(x => (x % 16).toInt)
      .view.mapValues(_.map(x => if ((x / 16) % 2 == 0) 1L else -1L).sum)
      .toMap.filter(_._2 != 0L)
    val out = TextAnalysis.featureHash(d, dim = 16)
      .as[(Long, Int, Long)].collect().map(r => r._2 -> r._3).toMap
    out shouldBe expect
  }

  test("featureHash is invariant under input partitioning") {
    val d = docs((1 to 50).map(i =>
      i.toLong -> s"tok${i % 13} tok${(i * 5) % 13} filler$i common"): _*)
    assertSameRows(TextAnalysis.featureHash(d),
      TextAnalysis.featureHash(d.repartition(7)))
  }

  test("tfIdfTopK: floor-rational scores, per-doc ranks, rare terms beat common") {
    import spark.implicits._
    val d = docs(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "durian")
    // N=3; df: apple 1, banana 2, cherry 1, durian 1
    // idf_e6: apple/cherry/durian (3e6)//1 = 3000000; banana 1500000
    val out = TextAnalysis.tfIdfTopK(d, k = 5)
      .as[(Long, String, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    out((1L, "apple")) shouldBe ((1L, "apple", 2L, 1L, 6000000L, 1))
    out((1L, "banana")) shouldBe ((1L, "banana", 1L, 2L, 1500000L, 2))
    out((2L, "cherry"))._5 shouldBe 3000000L
    out((2L, "cherry"))._6 shouldBe 1   // rare cherry outranks common banana
    out((2L, "banana"))._6 shouldBe 2
    out((3L, "durian")) shouldBe ((3L, "durian", 1L, 1L, 3000000L, 1))
  }

  test("tfIdfTopK: k truncates and ranks stay contiguous from 1") {
    val d = docs(1L -> "a b c d e f g h")
    val out = TextAnalysis.tfIdfTopK(d, k = 3).collect()
    out.length shouldBe 3
    out.map(_.getAs[Int]("rank")).sorted.toSeq shouldBe Seq(1, 2, 3)
  }

  test("tfIdfTopK plan: WindowGroupLimit top-k, text tokenized once") {
    val d = docs(1L -> "a b c", 2L -> "b c d")
    def explodes(materialize: Boolean) = TextAnalysis
      .tfIdfTopK(d, k = 2, materialize = materialize)
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Generate explode"))
    // rank<=k must compile to the pre-shuffle partial top-k
    TextAnalysis.tfIdfTopK(d, k = 2).queryExecution.executedPlan
      .toString should include("WindowGroupLimit")
    // without materialization the tf⋈df join re-tokenizes the corpus
    // on both sides; the checkpoint collapses every explode out of the
    // final plan (tokenization ran exactly once, in the checkpoint job)
    explodes(materialize = false) should be >= 2
    explodes(materialize = true) shouldBe 0
  }

  test("property: tfIdfTopK equals a brute-force reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val word = Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val doc = Gen.choose(1, 12).flatMap(Gen.listOfN(_, word).map(_.mkString(" ")))
    val corpus = Gen.choose(1, 8).flatMap(Gen.listOfN(_, doc))
    val prop = Prop.forAll(corpus) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.tfIdfTopK(d, k = 3)
        .as[(Long, String, Long, Long, Long, Int)].collect()
        .map(r => (r._1, r._6) -> (r._2, r._3, r._4, r._5)).toMap
      // brute reference in plain Scala
      val toks = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val n = texts.size.toLong
      val dfreq = toks.values.flatMap(_.distinct).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val expect = toks.flatMap { case (id, ws) =>
        ws.groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .map { case (w, tf) => (w, tf, dfreq(w), tf * (1000000L * n / dfreq(w))) }
          .sortBy { case (w, _, _, s) => (-s, w) }
          .take(3).zipWithIndex
          .map { case ((w, tf, df_, s), i) => (id, i + 1) -> ((w, tf, df_, s)) }
      }
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"tfIdfTopK property: $res")
  }

  test("piiScan counts pattern families; piiRedact replaces with placeholders") {
    import spark.implicits._
    val d = docs(
      1L -> "contact John.Doe@Example.com or 555-123-4567 today",
      2L -> "hosts 10.0.0.1 and 192.168.1.1 reachable",
      3L -> "nothing sensitive here")
    val scan = TextAnalysis.piiScan(d)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    scan(1L) shouldBe ((1L, 1L, 0L, 1L, true))   // email, ipv4, phone order: sorted names
    scan(2L) shouldBe ((2L, 0L, 2L, 0L, true))
    scan(3L) shouldBe ((3L, 0L, 0L, 0L, false))
    val red = d.filter(col("doc_id") === 1L)
      .select(TextAnalysis.piiRedact(col("text"))).as[String].head()
    red shouldBe "contact <email> or <phone> today"
  }

  test("codeProfile: keyword heads, indents, brace/semicolon endings count once per line") {
    import spark.implicits._
    val d = docs(
      1L -> "def f(x):\n    return x\nplain prose line\nalso prose",
      2L -> "just one prose line",
      3L -> "n = 1;\nif (n) {\n\temit(n);\n}")
    val out = TextAnalysis.codeProfile(d)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 4 lines; "def f(x):" (keyword) + "    return x" (indent,
    // keyword — counted ONCE) = 2 code lines -> 500 permille.
    out(1L) shouldBe ((1L, 4L, 2L, 500L, true))
    out(2L) shouldBe ((2L, 1L, 0L, 0L, false))
    // doc 3: every line is code (; { tab-indent }) -> 1000 permille.
    out(3L) shouldBe ((3L, 4L, 4L, 1000L, true))
  }

  test("cleanText: control chars to space, runs collapsed, edges trimmed") {
    import spark.implicits._
    val d = docs(
      1L -> "  Hello\tWorld\n\nagain  ",
      2L -> "already clean")
    val out = d.select(col("doc_id"), TextAnalysis.cleanText(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "hello world again"
    out(2L) shouldBe "already clean"
    val rep = TextAnalysis.cleanReport(d)
      .select("doc_id", "changed").as[(Long, Boolean)].collect().toMap
    rep(1L) shouldBe true
    rep(2L) shouldBe false
  }

  test("tokenize lowercases, strips punctuation, collapses whitespace") {
    val out = withTokens(docs((1L, "Hello, WORLD!!  foo-bar 42")))
      .select("tokens").collect()(0).getSeq[String](0)
    out shouldBe Seq("hello", "world", "foo", "bar", "42")
  }

  test("tokenStats counts occurrences and doc frequency") {
    val out = tokenStats(docs((1L, "a b a"), (2L, "a c")))
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(("a", 3L, 2L), ("b", 1L, 1L), ("c", 1L, 1L))
  }

  test("bigramStats zips adjacent tokens; single-token docs contribute nothing") {
    val out = bigramStats(docs((1L, "a b a b"), (2L, "b a"), (3L, "solo")))
      .orderBy("bigram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // doc1: "a b","b a","a b"; doc2: "b a"
    out.toSeq shouldBe Seq(("a b", 2L, 1L), ("b a", 2L, 2L))
  }

  test("fingerprint is order-sensitive and reproducible") {
    val fp = docs((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    fp(0) shouldBe fp(2) // identical sequence -> identical fingerprint
    fp(0) should not be fp(1) // permuted sequence -> different fingerprint
  }

  test("languageId picks the stopword set with most hits, und when none") {
    val out = docs(
      (1L, "the cat is on the mat and it is fine"),
      (2L, "der hund ist nicht mit der katze und"),
      (3L, "xyzzy qwerty"))
      .select(col("doc_id"), languageId(tokens(col("text"))).as("l"))
      .orderBy("doc_id").collect().map(_.getString(1))
    out.toSeq shouldBe Seq("en", "de", "und")
  }

  test("quality score stays in [0,1] and rewards diversity/stopwords") {
    val out = docProfile(docs(
      (1L, "the quick brown fox jumps over the lazy dog and it runs on"),
      (2L, "spam spam spam spam spam spam")))
      .orderBy("doc_id").collect()
    val good = out(0).getAs[Double]("quality_score")
    val bad = out(1).getAs[Double]("quality_score")
    good should be > bad
    all(Seq(good, bad)) should (be >= 0.0 and be <= 1.0)
  }

  test("docProfile handles the degenerate empty document") {
    val out = docProfile(docs((1L, ""))).collect()(0)
    out.getAs[Long]("n_tokens") shouldBe 0L
    out.getAs[Long]("fingerprint") shouldBe 0L
    // ratios are 0/0 -> null under non-ANSI division
    out.isNullAt(out.fieldIndex("avg_token_len")) shouldBe true
  }

  test("BPE-ish token count splits contractions and punctuation runs") {
    val out = TextAnalysis.tokenCounts(docs(
      (1L, "it's fine, really!!"),   // it,'s,fine,,,really,!! -> 6 bpe
      (2L, "plain words here")))     // 3 both ways
      .orderBy("doc_id").collect()
    out(0).getAs[Long]("n_bpe_tokens") shouldBe 6L
    out(0).getAs[Long]("n_ws_tokens") shouldBe 4L // it, s, fine, really
    out(1).getAs[Long]("n_bpe_tokens") shouldBe 3L
    out(1).getAs[Long]("n_ws_tokens") shouldBe 3L
  }

  test("bigramFamiliarity scores docs by mean corpus bigram count") {
    // corpus counts: "a b" -> 2, "b c" -> 1
    val out = TextAnalysis.bigramFamiliarity(docs(
        (1L, "a b c"),   // (2 + 1) / 2 = 1.5
        (2L, "a b"),     // 2 / 1 = 2.0
        (3L, "x")))      // no bigrams -> 0, null
      .orderBy("doc_id").collect()
    out(0).getAs[Long]("n_bigrams") shouldBe 2L
    out(0).getAs[Double]("familiarity") shouldBe 1.5
    out(1).getAs[Long]("n_bigrams") shouldBe 1L
    out(1).getAs[Double]("familiarity") shouldBe 2.0
    out(2).getAs[Long]("n_bigrams") shouldBe 0L
    out(2).isNullAt(out(2).fieldIndex("familiarity")) shouldBe true
  }

  test("corpusCard: hand-computed datasheet cells; no Expand for the single distinct") {
    import spark.implicits._
    val d = Seq(
      (1L, "srcA", "en", "one two three"),
      (2L, "srcA", "en", "one two three"), // exact dup: distinct = 2, docs = 3
      (3L, "srcA", "en", "four five"),
      (4L, "srcB", "fr", "un deux trois quatre")
    ).toDF("doc_id", "source", "lang", "text")
    val card = TextAnalysis.corpusCard(d, Seq("source", "lang"))
    val rows = card
      .select("source", "lang", "n_docs", "n_tokens", "n_chars",
        "n_distinct_texts", "docs_permille")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    rows shouldBe Seq(
      ("srcA", "en", 3L, 8L, 35L, 2L, 750L),
      ("srcB", "fr", 1L, 4L, 20L, 1L, 250L))
    // a single count(distinct) must keep the two-phase hash-agg plan:
    // Catalyst's Expand blowup appears only at >= 2 distinct aggs
    card.queryExecution.executedPlan.toString should not include "Expand"
  }

  test("collocations: hand-computed Dice, minCount prunes, phrase beats chance pair") {
    import spark.implicits._
    // "new york" always together (5x); "the cat" co-occurs twice but
    // both words are frequent elsewhere -> lower Dice.
    val d = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "the cat and the dog and the cat and the bird")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(d, minCount = 2, k = 10)
      .select("w1", "w2", "c_ab", "dice_e6")
      .as[(String, String, Long, Long)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    // new: 5, york: 5, new->york 5x: dice = 2*5*1e6 div 10 = 1_000_000
    byPair(("new", "york"))._4 shouldBe 1000000L
    // york->new occurs 4x (between repetitions): 2*4e6 div 10
    byPair(("york", "new"))._4 shouldBe 800000L
    // the: 4, cat: 2, the->cat 2x: 2*2e6 div 6 = 666_666
    byPair(("the", "cat"))._4 shouldBe 666666L
    // minCount prunes: "the dog" (1x) absent
    byPair.contains(("the", "dog")) shouldBe false
    // ranking: the perfect phrase outranks the chance pair
    out.head._1 -> out.head._2 shouldBe ("new" -> "york")
  }

  test("readability: hand-computed Flesch micro-units, floors and edge docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences, 6 syllables
      (2L, "no punctuation here at all"), // sentences floored at 1
      (3L, ""),                           // wordless: dropped
      (4L, "zzz pfft")                    // vowelless: 0 syllables, still scored
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(d)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 6L, 2L, 6L,
      206835000L - 1015L * 3000L - 84600L * 1000L)) // = 119190000
    out(2L)._3 shouldBe 1L
    out(4L) shouldBe ((4L, 2L, 1L, 0L, 206835000L - 1015L * 2000L))
    out.contains(3L) shouldBe false
  }

  test("phraseSearch: token-boundary matches, 1-based first_pos, non-matches absent") {
    import spark.implicits._
    val d = docs(
      1L -> "the quick fox saw the quick dog",  // 2 matches, first at 1
      2L -> "The QUICK! brown",                 // tokenizer case/punct fold -> 1
      3L -> "quick the",                        // reversed: no match
      4L -> "thequick runs",                    // no token boundary: no match
      5L -> "the slowquick")                    // second word mismatch
    val out = TextAnalysis.phraseSearch(d, "the quick")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 2L, 1L))
    out(2L) shouldBe ((2L, 1L, 1L))
    out.keySet shouldBe Set(1L, 2L)
  }

  test("phraseSearch: overlapping occurrences of a periodic phrase all count") {
    import spark.implicits._
    // "a a a" contains "a a" at positions 1 AND 2 — the replace-count
    // shortcut would report 1; the postings join must report 2.
    val d = docs(1L -> "a a a", 2L -> "b a a a a b")
    val out = TextAnalysis.phraseSearch(d, "a a")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 2L, 1L))
    out(2L) shouldBe ((2L, 3L, 2L))
    // Period-3 phrase over the same stream.
    val tri = TextAnalysis.phraseSearch(d, "a a a")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    tri(1L) shouldBe ((1L, 1L, 1L))
    tri(2L) shouldBe ((2L, 2L, 2L))
  }

  test("phraseSearch: single-word phrase degenerates to token occurrence counts") {
    import spark.implicits._
    val d = docs(1L -> "x y x z x", 2L -> "y z")
    val out = TextAnalysis.phraseSearch(d, "x")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 3L, 1L))
    out.keySet shouldBe Set(1L)
  }

  test("phraseSearch: result is invariant under input partitioning") {
    import spark.implicits._
    val rows = (0L until 200L).map(i =>
      (i, if (i % 7 == 0) "pad table table pad table table" else "table pad table"))
    val d = rows.toDF("doc_id", "text")
    val r1 = TextAnalysis.phraseSearch(d.repartition(1), "table table")
    val r9 = TextAnalysis.phraseSearch(d.repartition(9, col("doc_id")), "table table")
    assertSameRows(r1, r9)
  }

  test("prefixDuplication: shared openings grouped; short docs use full prefix") {
    val d = docs(
      1L -> "terms of service apply here body one",
      2L -> "terms of service apply here completely different",
      3L -> "unique opening line never repeats",
      4L -> "short doc",        // < k tokens: full list is the prefix
      5L -> "short doc")
    val out = TextAnalysis.prefixDuplication(d, k = 5, minDocs = 2)
      .collect().map(r => r.getAs[String]("prefix") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"))).toMap
    out("terms of service apply here") shouldBe ((2L, 1L))
    out("short doc") shouldBe ((2L, 4L))
    out should have size 2
  }

  test("kwic: context windows clamp at edges; overlapping hits each get a row") {
    val d = docs(
      1L -> "alpha beta table table gamma delta",
      2L -> "table table table")   // period-1 overlap: starts at 1 and 2
    val out = TextAnalysis.kwic(d, "table table", window = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")) ->
        (r.getAs[String]("before"), r.getAs[String]("match"),
         r.getAs[String]("after"))).toMap
    out((1L, 3)) shouldBe (("alpha beta", "table table", "gamma delta"))
    // doc 2: both overlapping starts; edges clamp to empty context
    out((2L, 1)) shouldBe (("", "table table", "table"))
    out((2L, 2)) shouldBe (("table", "table table", ""))
    out should have size 3
  }

  test("encodingAudit: counts each artifact class; clean text is clean") {
    val d = docs(
      1L -> "perfectly clean ascii text",
      2L -> "broken � twice � here",
      3L -> "cafÃ© and â€™quotedâ€™",   // Ã© + â€™ ×2
      4L -> "nel\u0085and del\u009Fresidue")
    val out = TextAnalysis.encodingAudit(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_replacement"), r.getAs[Long]("n_mojibake"),
         r.getAs[Long]("n_c1_controls"), r.getAs[Boolean]("suspect"))).toMap
    out(1L) shouldBe ((0L, 0L, 0L, false))
    out(2L) shouldBe ((2L, 0L, 0L, true))
    out(3L) shouldBe ((0L, 3L, 0L, true))
    out(4L) shouldBe ((0L, 0L, 2L, true))
  }

  test("bm25Search: hand-computed integer score; common terms contribute 0") {
    // 10 docs, dl=3 each: N=10, L=30, A=3. 'rare' df=1:
    // ratio=(20-2+1) div 3 = 6, idf=floor(log2 6)=2,
    // score = 2*22*3*1*1000 div (10*3*1 + 3*3 + 9*3) = 132000 div 66 = 2000.
    // 'word' df=10: ratio=(20-20+1) div 21 = 0 -> clamp 1 -> idf 0.
    val d = docs((1L -> "rare word word") +:
      (2L to 10L).map(i => i -> "word pad pad"): _*)
    val out = TextAnalysis.bm25Search(d, Seq("rare", "word"), k = 3).collect()
    out.head.getAs[Long]("doc_id") shouldBe 1L
    out.head.getAs[Long]("n_terms_hit") shouldBe 2L
    out.head.getAs[Long]("bm25_units") shouldBe 2000L
    // remaining docs hit only the idf-0 term: 0 units, doc_id order
    out.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 2L, 3L)
    out.drop(1).foreach(_.getAs[Long]("bm25_units") shouldBe 0L)
  }

  test("bm25Search: tf saturates sublinearly (the k1 contract)") {
    // doubling tf must score LESS than double: tf=2 gives
    // 2*22*3*2*1000 div (60+9+27) = 264000 div 96 = 2750 < 2*2000.
    val d = docs((1L -> "rare rare word") +:
      (2L to 10L).map(i => i -> "word pad pad"): _*)
    val out = TextAnalysis.bm25Search(d, Seq("rare"), k = 1).collect()
    out.head.getAs[Long]("bm25_units") shouldBe 2750L
  }

  test("bm25Search is invariant under input partitioning") {
    val d = docs((0L until 100L).map(i =>
      i -> (if (i % 9 == 0) "needle mark word" else "word pad mark")): _*)
    assertSameRows(
      TextAnalysis.bm25Search(d, Seq("needle", "mark"), k = 20),
      TextAnalysis.bm25Search(d.repartition(7), Seq("needle", "mark"), k = 20))
  }

  test("cardScan: Luhn separates real PANs from same-shape digit runs") {
    import spark.implicits._
    val d = docs(
      1L -> "pay 4111111111111111 now",          // valid Visa test PAN
      2L -> "order 4111111111111112 shipped",    // same shape, bad checksum
      3L -> "card 4111-1111-1111-1111 on file",  // separators normalized
      4L -> "ids 411111111111 and 123",          // 12 digits: below PAN range
      5L -> "alt 5500005555555559 or 4111111111111112", // one of two valid
      6L -> "no digits here at all")
    val out = TextAnalysis.cardScan(d)
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out(1L) shouldBe ((1L, 1L, Some("1111")))
    out(2L) shouldBe ((1L, 0L, None))   // candidate counted, checksum fails
    out(3L) shouldBe ((1L, 1L, Some("1111")))
    out(4L) shouldBe ((0L, 0L, None))   // too short: never a candidate
    out(5L) shouldBe ((2L, 1L, Some("5559")))
    out(6L) shouldBe ((0L, 0L, None))   // explode_outer keeps the doc
  }

  test("cardScan is invariant under input partitioning") {
    val d = docs((1L to 40L).map(i =>
      i -> s"ref 4111111111111${111 + i} and text"): _*)
    assertSameRows(TextAnalysis.cardScan(d),
      TextAnalysis.cardScan(d.repartition(7)))
  }

  test("rakeKeywords: hand deg/freq scores, multi-word phrases outrank singles") {
    // stopwords split runs: phrases [big data analytics],
    // [big data platform], [data]; deg/freq by hand:
    // big 6/2=3000, data 7/3=2333, analytics 3000, platform 3000
    val d = docs(1L -> "big data analytics is big data platform on data")
    val out = TextAnalysis.rakeKeywords(d, minOccurrences = 1L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("score_e3")))
    out.toSeq shouldBe Seq(
      ("big data analytics", 3L, 1L, 8333L),
      ("big data platform", 3L, 1L, 8333L),
      ("data", 1L, 1L, 2333L))
  }

  test("rakeKeywords: repeated phrases count occurrences; minOccurrences gates") {
    val d = docs(
      1L -> "fast scan of fast scan",
      2L -> "fast scan and slow merge")
    val out = TextAnalysis.rakeKeywords(d, minOccurrences = 2L).collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("fast scan")
    out.head.getAs[Long]("n_occurrences") shouldBe 3L
    // ...and the corpus-global word scores make every occurrence of a
    // phrase score identically (max == the only value)
    val all = TextAnalysis.rakeKeywords(d, minOccurrences = 1L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("score_e3")).toMap
    all.keySet shouldBe Set("fast scan", "slow merge")
    val rep = TextAnalysis.rakeKeywords(
      docs(1L -> "fast scan of fast scan",
        2L -> "fast scan and slow merge").repartition(5),
      minOccurrences = 1L).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("score_e3")).toMap
    rep shouldBe all
  }

  test("surprisalScores: hand bits, both filter tails, empty docs drop") {
    // corpus: "a" x12, "rare" x2, "mid" x2 -> N = 16
    // bits(a) = floor(log2(16 div 12 = 1)) = 0
    // bits(rare) = bits(mid) = floor(log2(8)) = 3
    val d = docs(
      1L -> ("a " * 10).trim,            // all-common: 0 bits/token
      2L -> "rare rare mid mid",          // all-rare: 3 bits/token
      3L -> "a a",                        // common again
      4L -> "")                           // tokenless: drops
    val out = TextAnalysis.surprisalScores(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("total_bits"), r.getAs[Long]("mean_millibits")))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((10L, 0L, 0L))
    out(2L) shouldBe ((4L, 12L, 3000L))
    out(3L) shouldBe ((2L, 0L, 0L))
  }

  test("surprisalScores: a uniform corpus scores log2(vocab) everywhere; partition-invariant") {
    // 8 tokens each appearing once: every token bits = floor(log2 8) = 3
    val d = docs(1L -> "t1 t2 t3 t4", 2L -> "t5 t6 t7 t8")
    val out = TextAnalysis.surprisalScores(d).collect()
    out.foreach(_.getAs[Long]("mean_millibits") shouldBe 3000L)
    assertSameRows(TextAnalysis.surprisalScores(d),
      TextAnalysis.surprisalScores(d.repartition(7)))
  }

  test("sStem: the three Harman rules and every stated exception") {
    import spark.implicits._
    val cases = Seq(
      "queries" -> "query", "ponies" -> "pony",     // ies -> y
      "tables" -> "table", "classes" -> "classe",   // es -> e (s drop)
      "runs" -> "run", "words" -> "word",           // s drop
      "goes" -> "goes", "sees" -> "sees",           // -oes / -ees keep
      "bus" -> "bus", "miss" -> "miss",             // -us / -ss keep
      "was" -> "was", "its" -> "its",               // len < 4 guard
      "query" -> "query")                           // no suffix
    val out = cases.map(_._1).toDF("t")
      .select(col("t"), TextAnalysis.sStem(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => out(in) shouldBe want }
  }

  test("stemConflation groups forms under one stem with sorted lists") {
    val d = docs(
      1L -> "the query and the queries run",
      2L -> "tables beat the table; runs run",
      3L -> "bus stops")
    val out = TextAnalysis.stemConflation(d).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_forms"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("forms"))).toSet
    out shouldBe Set(
      ("query", 2L, 2L, "queries,query"),
      ("table", 2L, 2L, "table,tables"),
      ("run", 2L, 3L, "run,runs"))
    // singleton stems (bus, stops->stop, ...) never surface
    val again = TextAnalysis.stemConflation(d.repartition(5)).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_forms"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("forms"))).toSet
    again shouldBe out
  }

  private def slicedDocs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("lang", "text")
  }

  test("distributionDrift: identical slices 0, disjoint slices 1000, hand middle case") {
    val d = slicedDocs(
      ("a", "x y z"), ("b", "x y z"),      // identical distributions
      ("c", "p q r"))                       // disjoint from both
    val out = TextAnalysis.distributionDrift(d, "lang").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("tv_permille"))).toMap
    out(("a", "b")) shouldBe 0L
    out(("a", "c")) shouldBe 1000L
    out(("b", "c")) shouldBe 1000L
    // hand middle case: a = {x:2, y:1} (N=3), d2 = {x:1, y:2} (N=3)
    // TV = (|2-1| + |1-2|) / (2*3) = 1/3 -> 333
    val mid = TextAnalysis.distributionDrift(
      slicedDocs(("a", "x x y"), ("b", "x y y")), "lang").collect().head
    mid.getAs[Long]("tv_permille") shouldBe 333L
    mid.getAs[Long]("n_tokens_a") shouldBe 3L
    mid.getAs[Long]("n_tokens_b") shouldBe 3L
  }

  test("distributionDrift: unequal totals use exact cross-products") {
    // a = {x:1} (N=1), b = {x:1, y:3} (N=4)
    // TV = (|1*4 - 1*1| + |0*4 - 3*1|) / (2*1*4) = 6/8 -> 750
    val out = TextAnalysis.distributionDrift(
      slicedDocs(("a", "x"), ("b", "x y y y")), "lang").collect().head
    out.getAs[Long]("tv_permille") shouldBe 750L
  }

  test("distributionDrift guards: one slice refused, cap refused, partition-invariant") {
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.distributionDrift(slicedDocs(("a", "x")), "lang")
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.distributionDrift(
        slicedDocs((1 to 5).map(i => (s"s$i", "x")): _*), "lang",
        maxSlices = 3)
    val d = slicedDocs((1 to 60).map(i =>
      (s"s${i % 4}", s"w${i % 7} w${i % 11} common")): _*)
    assertSameRows(
      TextAnalysis.distributionDrift(d, "lang"),
      TextAnalysis.distributionDrift(d.repartition(9), "lang"))
  }

  private def condMap(d: org.apache.spark.sql.DataFrame) =
    TextAnalysis.conditionalSurprisal(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap

  test("conditionalSurprisal: hand bits over a two-doc corpus") {
    // corpus: c(a b)=3, c(b a)=1, c(b c)=1; c(a.)=3, c(b.)=2.
    // bits: (a b)=log2(3 div 3)=0, (b a)=log2(2 div 1)=1, (b c)=1
    val out = condMap(docs(1L -> "a b a b", 2L -> "a b c"))
    out(1L) shouldBe ((3L, Some(1L), Some(333L))) // 0+1+0 over 3
    out(2L) shouldBe ((2L, Some(1L), Some(500L))) // 0+1 over 2
  }

  test("conditionalSurprisal: word salad of common words scores high, template zero") {
    // same two words; the template's transitions are deterministic,
    // the salad's are not — unigram measures cannot tell them apart
    val out = condMap(docs(1L -> "p q p q p q", 2L -> "p p q q"))
    out(1L)._3 shouldBe Some(0L)     // pq/qp both majority: 0 bits
    out(2L)._3 shouldBe Some(1000L)  // pp(2)+pq(0)+qq(1) over 3
  }

  test("conditionalSurprisal: short docs surface with zero bigrams and NULLs; invariance") {
    val out = condMap(docs(1L -> "solo", 2L -> "two words"))
    out(1L) shouldBe ((0L, None, None))
    out(2L)._1 shouldBe 1L
    val d = docs((1L to 30L).map(i =>
      i -> s"w${i % 5} w${(i * 3) % 7} w${i % 5} w${(i * 5) % 6}"): _*)
    assertSameRows(TextAnalysis.conditionalSurprisal(d),
      TextAnalysis.conditionalSurprisal(d.repartition(7)))
  }

  test("quotientBits: exact floor-log2 incl. both sides of the 2^62 clip branch") {
    import spark.implicits._
    // (num, den, expected bits): the tiny-probability clip (q >= 2^62
    // -> 62), an exact power-of-ten quotient (10 -> 3 bits), the p = 1
    // floor (0 bits), and a quotient exactly AT the int64 edge (2^63-1
    // -> clipped 62, which is also its true floor-log2)
    val d = Seq(
      ("3", "1000000000000000000000000000000", 62L),
      ("100000000000000000000000000000", "1000000000000000000000000000000", 3L),
      ("7", "7", 0L),
      ("1", "9223372036854775807", 62L)
    ).toDF("num", "den", "want")
      .select(expr("CAST(num AS DECIMAL(38,0))").as("n"),
        expr("CAST(den AS DECIMAL(38,0))").as("d"), col("want"))
    val rows = d.select(graft.core.Exact.quotientBits("n", "d").as("got"),
      col("want")).as[(Long, Long)].collect()
    rows.foreach { case (got, want) => got shouldBe want }
  }

  test("knSurprisal: interpolated Kneser-Ney by hand — seen, backoff, OOV, empty") {
    import spark.implicits._
    // train "a b a b a c": c12 = {(a,b)->2, (b,a)->2, (a,c)->1},
    // c1 = {a->3, b->2}, n1f = {a->2, b->1}, n1r = {a,b,c -> 1},
    // B = 3 bigram types, V = 3 tokens, Z = 7. D = 3/4 as x4 integers.
    val train = docs(1L -> "a b a b a c")
    val target = docs(
      1L -> "a b", // seen: num = (8-3)*7 + 3*2*2 = 47, den = 84 -> 0 bits
      2L -> "c a", // unseen history c: p = pcont(a) = 2/7 -> 3 div -> 1 bit
      3L -> "a z", // seen history, OOV w: num = 3*2*1 = 6, den = 84 -> q=14 -> 3 bits
      4L -> "b")   // bigram-less: NULLs
    val out = TextAnalysis.knSurprisal(train, target).orderBy("doc_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    out shouldBe Seq(
      (1L, 1L, 0L, Some(0L), Some(0L)),
      (2L, 1L, 1L, Some(1L), Some(1000L)),
      (3L, 1L, 1L, Some(3L), Some(3000L)),
      (4L, 0L, 0L, None, None))
  }

  test("knSurprisal: the discount identity makes each seen history a proper model") {
    import spark.implicits._
    // For history 'a' of the hand corpus, P(w|a) over {a,b,c,unk} must
    // sum to exactly 1: numerators 12 + 47 + 19 + 6 = 84 = den. Driven
    // through the OPERATOR by scoring one doc per continuation and
    // recovering each numerator from its bits' quotient bound — here
    // asserted directly on the arithmetic the scaladoc states.
    val nums = Seq(
      math.max(4 * 0 - 3, 0) * 7 + 3 * 2 * 2, // w=a (unseen pair, n1r(a)+1=2)
      math.max(4 * 2 - 3, 0) * 7 + 3 * 2 * 2, // w=b
      math.max(4 * 1 - 3, 0) * 7 + 3 * 2 * 2, // w=c
      3 * 2 * 1)                              // unk
    nums.sum shouldBe 4 * 3 * 7
  }

  test("knSurprisal: novel transitions score above familiar ones; partitioning-invariant") {
    import spark.implicits._
    val train = docs((1L to 40L).map(i =>
      i -> s"t${i % 4} t${(i + 1) % 4} t${(i + 2) % 4}"): _*)
    val target = docs(
      100L -> "t0 t1 t2 t3",   // transitions the train slice saw
      101L -> "t3 t1 t0 t2")   // reversed-order transitions it did not
    val out = TextAnalysis.knSurprisal(train, target)
    val m = out.select("doc_id", "mean_millibits")
      .as[(Long, Long)].collect().toMap
    m(101L) should be > m(100L)
    assertSameRows(out,
      TextAnalysis.knSurprisal(train.repartition(7), target.repartition(3)))
  }

  test("termDispersion: hand DP values — even spread 0, burst 500, small-doc burst 800") {
    // two docs of 4 tokens each, S = 8
    val d = docs(1L -> "x x t pad", 2L -> "t u u pad")
    val out = TextAnalysis.termDispersion(d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // t: once per equal-sized doc -> perfectly corpus-shaped, DP = 0
    out("t") shouldBe ((2L, 0L))
    // x: 2 of 2 in doc1 -> DP = (|1 - 1/2| + 1/2)/2 = 1/2
    out("x") shouldBe ((2L, 500L))
    out("u") shouldBe ((2L, 500L))
    // concentrated in the SMALL doc of an uneven corpus: sizes 2 & 8
    val d2 = docs(1L -> "q w", 2L -> "a b c d e f g h")
    val out2 = TextAnalysis.termDispersion(d2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    out2("q") shouldBe 800L // (|1 - 2/10| + 8/10)/2 = 0.8
  }

  test("termDispersion is invariant under input partitioning") {
    val d = docs((1L to 40L).map(i =>
      i -> s"w${i % 7} w${i % 13} w${i % 3} tail$i"): _*)
    assertSameRows(TextAnalysis.termDispersion(d),
      TextAnalysis.termDispersion(d.repartition(7)))
  }
}
