package graft.text

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-construction step of an LLM data
  * pipeline, one level deeper than the corpus token counting in
  * [[TextAnalysis]] (whose `bpePattern` only approximates a trained
  * tokenizer's pre-split).
  *
  * == Scale shape: one distributed pass, then a driver-side loop ==
  *
  * The corpus text is read EXACTLY ONCE — the distributed word-type
  * count ([[wordCounts]], a map-side-combined aggregation). Everything
  * after that operates on the WORD-TYPE table, whose size is bounded by
  * the vocabulary (Heaps' law: sublinear in corpus size — single-digit
  * millions of `[a-z0-9]+` types even at 100 TB, i.e. tens of MB of
  * (word, freq) pairs), so it is collected to the driver and the merge
  * loop runs THERE, in memory, with incremental pair-delta updates —
  * the actual algorithm of the paper's reference implementation:
  *
  *  - pair counts and a pair→words occurrence index are built once
  *    from the initial character state;
  *  - each iteration picks the argmax pair (count desc, then
  *    lexicographic — deterministic) by scanning the count map, then
  *    rewrites ONLY the word types containing that pair, pushing
  *    count/index deltas for just the pairs those rewrites destroy and
  *    create.
  *
  * Per-merge cost is therefore proportional to the number of words
  * containing the chosen pair — NOT to the corpus, NOT to the type
  * table, and involves no Spark job: training 32k merges is 32k map
  * scans + bounded rewrites, minutes on one core, where a
  * job-per-merge distributed loop would pay 32k scheduler round-trips
  * and materializations of state that fits in one executor's L2. (A
  * previous revision of this file ran exactly that loop; it was the
  * worst of both worlds and is gone.)
  *
  * == Encoding: rank-priority with a watermark, O(word²), independent
  * of vocabulary size ==
  *
  * Encoding SEMANTICS are defined by [[applyMerges]]: replay the
  * learned merges in order, one greedy left-to-right pass each — the
  * exact segmentation training itself produced. Its cost is
  * O(len × numMerges) per word, which at a real vocabulary (32k
  * merges) is ~1000× more scans than ever apply. [[rankEncode]]
  * computes the IDENTICAL result in O(len × appliedMerges): among the
  * adjacent pairs currently present, jump directly to the one with the
  * smallest learned rank above a watermark, apply its pass, raise the
  * watermark. Equivalence argument: in-order replay between two
  * applied ranks only runs passes whose pair is absent (no-ops), and a
  * pair occurrence created by a pass can only be merged by a LATER
  * rank in the replay — exactly what the watermark admits. (This is
  * deliberately NOT the tokenizer-library "re-apply earlier ranks"
  * priority merge, which can diverge from the training segmentation
  * when a later merge recreates an earlier pair; BpeSpec pins
  * rankEncode ≡ applyMerges on random merge lists.)
  *
  * Determinism: merge choice breaks count ties lexicographically on
  * (left, right); the per-word merge is a deterministic left-to-right
  * greedy rewrite — the learned merge list is a pure function of the
  * corpus, independent of partitioning and of the collected row order.
  * The FIRST iteration's pair statistics are plain SQL (q90 oracle);
  * the loop and the encoder are pinned by BpeSpec against the paper's
  * hand-computable example plus a naive-recount reference trainer on
  * random corpora.
  */
object Bpe {

  /** End-of-word marker: distinguishes word-final symbols ("est</w>")
    * from word-internal ones — the detail that makes BPE respect word
    * boundaries. Never collides with real symbols (tokens are
    * [a-z0-9]+). */
  val EndOfWord = "</w>"

  /** Word-type frequencies: (word, freq), the only pass over the
    * corpus text. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextAnalysis.withTokens(docs, textCol)
      .select(explode(col("tokens")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial BPE state: each word type split into single-character
    * symbols plus the end-of-word marker. (Spark's split(_, "") keeps
    * a trailing "" — limit -1 semantics, unlike Scala's split — hence
    * the filter.) Used by the q90 oracle surface; the trainer builds
    * the same state driver-side. */
  def initialSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      concat(filter(split(col("word"), ""), _ =!= ""),
        array(lit(EndOfWord))).as("symbols"))

  /** Adjacent-symbol pair counts weighted by word frequency — the
    * statistic each BPE iteration maximizes. Slice+zip explode, one
    * map-side-combined aggregation (the q66 bigram shape). This is the
    * SQL-expressible iteration-1 statistic (q90's oracle); the trainer
    * maintains the same counts incrementally on the driver. */
  def pairCounts(symbolized: DataFrame): DataFrame =
    symbolized
      .filter(size(col("symbols")) >= 2)
      .select(col("freq"),
        explode(arrays_zip(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1).as("a"),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1).as("b"))).as("__p"))
      .groupBy(col("__p.a").as("sym_a"), col("__p.b").as("sym_b"))
      .agg(sum(col("freq")).as("cnt"))

  /** One greedy left-to-right merge pass: every adjacent (a, b)
    * becomes a+b; a merged symbol is not re-merged in the same pass
    * (standard BPE — "aaa" under (a,a) is [aa, a], not [aaa]).
    * Iterative, so a pathological word type (a megabyte base64 blob
    * tokenized as one [a-z0-9]+ run) costs heap, never stack. */
  private def mergePass(syms: collection.IndexedSeq[String], a: String, b: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out
  }

  /** List-shaped [[mergePass]], kept for the spec surface. */
  private[text] def mergeOnce(syms: List[String], a: String,
                              b: String): List[String] =
    mergePass(syms.toIndexedSeq, a, b).toList

  /** Reference encoder: replay the learned merges in order, one greedy
    * pass each — the segmentation training produced, by construction.
    * O(len × numMerges) per word: correct but slow at a real
    * vocabulary; production encoding goes through [[rankEncode]],
    * which BpeSpec pins to this exact semantics. */
  def applyMerges(word: String, merges: Seq[(String, String)]): List[String] = {
    val init = word.split("").toList :+ EndOfWord
    merges.foldLeft(init) { case (s, (a, b)) => mergeOnce(s, a, b) }
  }

  /** Learned ranks per pair, ascending. A pair CAN be learned twice
    * (a later merge may recreate occurrences of an already-merged
    * pair, which training then merges again), so the value is the
    * full rank list, not just the first. */
  def mergeRanks(merges: Seq[(String, String)]): Map[(String, String), List[Int]] =
    merges.zipWithIndex.groupBy(_._1)
      .map { case (p, l) => p -> l.map(_._2).sorted.toList }

  /** Fast encoder: identical output to [[applyMerges]] (see object doc
    * for the watermark equivalence argument) at O(len × appliedMerges)
    * per word — independent of the total number of learned merges.
    * Words are short, so the quadratic worst case is irrelevant; what
    * matters is NOT scanning 32k merge entries per word. */
  def rankEncode(word: String, ranks: Map[(String, String), List[Int]]): List[String] = {
    var syms: ArrayBuffer[String] = {
      val b = new ArrayBuffer[String](word.length + 1)
      var i = 0
      while (i < word.length) { b += word.charAt(i).toString; i += 1 }
      b += EndOfWord; b
    }
    var watermark = -1
    var done = false
    while (!done && syms.length >= 2) {
      // smallest learned rank above the watermark among present pairs
      var bestRank = Int.MaxValue
      var bestA: String = null; var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(rs) =>
            // rank lists are short (almost always length 1)
            val r = rs.find(_ > watermark).getOrElse(Int.MaxValue)
            if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
          case None =>
        }
        i += 1
      }
      if (bestA == null) done = true
      else { syms = mergePass(syms, bestA, bestB); watermark = bestRank }
    }
    syms.toList
  }

  /** Driver-side merge loop over a collected word-type table — the
    * in-memory core of [[trainBpe]], exposed for the spec's
    * naive-recount equivalence test. Incremental pair-delta
    * maintenance: `cnt` is exact at every step (rewrites subtract the
    * pairs they destroy and add the pairs they create, weighted by
    * type frequency); `where` (pair → word indices) may keep stale
    * members — a member whose occurrences were destroyed by a later
    * merge rewrites as a no-op with a zero net delta — but never
    * misses one, which is what argmax correctness needs. */
  def trainFromTypes(types: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val n = types.size
    val freqs = new Array[Long](n)
    val syms = new Array[ArrayBuffer[String]](n)
    var wi = 0
    types.foreach { case (w, f) =>
      freqs(wi) = f
      val b = new ArrayBuffer[String](w.length + 1)
      var i = 0
      while (i < w.length) { b += w.charAt(i).toString; i += 1 }
      b += EndOfWord
      syms(wi) = b
      wi += 1
    }

    val cnt = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    var w0 = 0
    while (w0 < n) {
      val s = syms(w0); val f = freqs(w0)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        cnt.update(p, cnt.getOrElse(p, 0L) + f)
        where.getOrElseUpdate(p, mutable.BitSet.empty) += w0
        i += 1
      }
      w0 += 1
    }

    // (count desc, then (a,b) ascending) — the q90 orderBy, exactly;
    // ASCII symbols make Scala string order == Spark's UTF8 order.
    def better(c: Long, p: (String, String), bc: Long, bp: (String, String)): Boolean =
      c > bc || (c == bc && (bp == null ||
        p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2)))

    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      var bestC = 0L
      var best: (String, String) = null
      cnt.foreach { case (p, c) =>
        if (c > 0 && better(c, p, bestC, best)) { bestC = c; best = p }
      }
      if (best == null) done = true // every word fully merged
      else {
        merges += best
        val (a, b) = best
        val members = where.getOrElse(best, mutable.BitSet.empty).toArray
        var mi = 0
        while (mi < members.length) {
          val w = members(mi)
          val f = freqs(w)
          val old = syms(w)
          // fast containment probe: stale members no-op without deltas
          var has = false
          var i = 0
          while (!has && i < old.length - 1) {
            has = old(i) == a && old(i + 1) == b; i += 1
          }
          if (has) {
            i = 0
            while (i < old.length - 1) {
              val p = (old(i), old(i + 1))
              cnt.update(p, cnt(p) - f)
              i += 1
            }
            val nu = mergePass(old, a, b)
            syms(w) = nu
            i = 0
            while (i < nu.length - 1) {
              val p = (nu(i), nu(i + 1))
              cnt.update(p, cnt.getOrElse(p, 0L) + f)
              where.getOrElseUpdate(p, mutable.BitSet.empty) += w
              i += 1
            }
          }
          mi += 1
        }
        // all occurrences merged: drop the exhausted entry (it is
        // re-created from scratch if a later merge re-forms the pair)
        cnt.remove(best)
        where.remove(best)
        it += 1
      }
    }
    merges.result()
  }

  /** Train `numMerges` BPE merges over the corpus: ONE distributed
    * word-type count, then the driver-side delta loop
    * ([[trainFromTypes]]) on the vocabulary-bounded collected table —
    * no Spark job inside the loop. */
  def trainBpe(docs: DataFrame, numMerges: Int,
               textCol: String = "text"): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainFromTypes(
      wordCounts(docs, textCol).as[(String, Long)].collect().toSeq,
      numMerges)
  }

  /** Per-doc token counts under a trained merge list — the "how many
    * tokens is my corpus" question answered with the REAL tokenizer
    * instead of [[TextAnalysis.bpeTokenCount]]'s regex estimate. The
    * rank map broadcasts (vocab-sized); each partition encodes with
    * [[rankEncode]] behind a word-type memo, so repeated tokens (Zipf:
    * most of them) cost one hash probe and the per-word cost is
    * independent of the merge-list length. */
  def encodeTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(mergeRanks(merges))
    TextAnalysis.withTokens(docs, textCol)
      .select(col(idCol).cast("long"), col("tokens"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Long]
        it.map { case (id, toks) =>
          var sum = 0L
          toks.foreach { w =>
            sum += memo.getOrElseUpdate(w, rankEncode(w, ranks).length.toLong)
          }
          (id, sum)
        }
      }
      .toDF(idCol, "n_bpe_tokens")
  }

  /** Tokenizer fertility by language — the multilingual tokenizer
    * EQUITY audit (Petrov et al. 2023, arXiv:2305.15425 "Language
    * Model Tokenizers Introduce Unfairness Between Languages"): a
    * tokenizer trained on one distribution fragments other languages
    * into more tokens per word, so those languages pay more context
    * budget and more per-token cost for the same content. Per lang:
    * doc/word/char/token mass plus the two headline rates as exact
    * integer permille — fertility (BPE tokens per whitespace word,
    * THE fairness number; ~1000 = one token per word) and characters
    * per token (the compression view; higher = cheaper). Both are
    * floors of exact BIGINT sums — engine-replayable, no float drift.
    *
    * Shape: [[encodeTokenCounts]]'s per-doc encode (word-type memo,
    * broadcast rank map) + one doc-keyed join of two doc-count-sized
    * frames + one lang aggregate — cost is the encode scan; nothing
    * exceeds doc-count rows after it. Zero-word languages emit NULL
    * rates (never a division blow-up). */
  def fertilityByLang(docs: DataFrame, merges: Seq[(String, String)],
                      idCol: String = "doc_id", textCol: String = "text",
                      langCol: String = "lang"): DataFrame = {
    val perDoc = encodeTokenCounts(docs, merges, idCol, textCol)
    val base = docs.select(col(idCol).cast("long").as(idCol),
      col(langCol),
      TextAnalysis.whitespaceTokenCount(col(textCol)).as("__words"),
      length(col(textCol)).cast("long").as("__chars"))
    base.join(perDoc, idCol)
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__words")).as("total_words"),
        sum(col("__chars")).as("total_chars"),
        sum(col("n_bpe_tokens")).as("total_bpe_tokens"))
      .select(col(langCol), col("n_docs"), col("total_words"),
        col("total_chars"), col("total_bpe_tokens"),
        when(col("total_words") > 0,
          expr("(total_bpe_tokens * 1000) div total_words"))
          .as("fertility_permille"),
        when(col("total_bpe_tokens") > 0,
          expr("(total_chars * 1000) div total_bpe_tokens"))
          .as("chars_per_token_permille"))
  }
}
