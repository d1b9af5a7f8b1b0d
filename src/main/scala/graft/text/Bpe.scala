package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.
  * 2016, arXiv:1508.07909) — the tokenizer-construction step of an LLM
  * data pipeline, one level deeper than the corpus token counting in
  * [[TextAnalysis]] (whose `bpePattern` only approximates a trained
  * tokenizer's pre-split).
  *
  * The classic algorithm is inherently iterative (each merge changes
  * the pair statistics the next merge is chosen from), so — exactly
  * like [[graft.similarity.Similarity.trainCentroids]] — the driver
  * runs the LOOP while every pass over data stays distributed:
  *
  *  - state is the WORD-TYPE table (word, freq, symbols), never the
  *    corpus: |distinct tokens| rows regardless of corpus size, and
  *    the corpus text is read exactly once (the word count);
  *  - each iteration is one distributed pair-count aggregation
  *    (explode adjacent symbol pairs, weight by word freq, map-side
  *    combined) of which only the TOP ROW is collected;
  *  - the chosen merge is applied per word type with a typed map —
  *    per-row imperative list rewriting, the genuinely non-relational
  *    step (a left fold with lookahead has no codegen'd expression
  *    form), on the bounded word-type table, never on documents.
  *
  * Determinism: merge choice breaks count ties lexicographically on
  * (left, right), and the per-word merge is a deterministic
  * left-to-right greedy rewrite — the learned merge list is a pure
  * function of the corpus, independent of partitioning. The FIRST
  * iteration's pair statistics are plain SQL (q90 oracle); the loop
  * and the encoder are pinned by BpeSpec against the paper's
  * hand-computable example.
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
    * the filter.) */
  def initialSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      concat(filter(split(col("word"), ""), _ =!= ""),
        array(lit(EndOfWord))).as("symbols"))

  /** Adjacent-symbol pair counts weighted by word frequency — the
    * statistic each BPE iteration maximizes. Slice+zip explode, one
    * map-side-combined aggregation (the q66 bigram shape). */
  def pairCounts(symbolized: DataFrame): DataFrame =
    symbolized
      .filter(size(col("symbols")) >= 2)
      .select(col("freq"),
        explode(arrays_zip(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1).as("a"),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1).as("b"))).as("__p"))
      .groupBy(col("__p.a").as("sym_a"), col("__p.b").as("sym_b"))
      .agg(sum(col("freq")).as("cnt"))

  /** One greedy left-to-right merge pass: every adjacent (a, b) in
    * `syms` becomes a+b; a merged symbol is not re-merged in the same
    * pass (standard BPE). */
  private[text] def mergeOnce(syms: List[String], a: String,
                              b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b => (a + b) :: mergeOnce(rest, a, b)
    case x :: rest => x :: mergeOnce(rest, a, b)
    case Nil => Nil
  }

  /** Encode one word (initial-symbol form) under a learned merge list:
    * merges apply in learned order, as at training time. */
  def applyMerges(word: String, merges: Seq[(String, String)]): List[String] = {
    val init = word.split("").toList :+ EndOfWord
    merges.foldLeft(init) { case (s, (a, b)) => mergeOnce(s, a, b) }
  }

  /** Train `numMerges` BPE merges over the corpus. Each iteration
    * collects exactly one row (the argmax pair); the word-type table
    * is localCheckpointed per iteration so lineage stays flat across
    * the loop (the trainCentroids discipline). */
  def trainBpe(docs: DataFrame, numMerges: Int,
               textCol: String = "text"): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var state: Dataset[(String, Long, List[String])] =
      initialSymbols(wordCounts(docs, textCol))
        .as[(String, Long, List[String])].localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(state.toDF("word", "freq", "symbols"))
        .orderBy(col("cnt").desc, col("sym_a"), col("sym_b"))
        .limit(1).as[(String, String, Long)].collect()
      if (top.isEmpty) done = true // every word fully merged
      else {
        val (a, b, _) = top(0)
        merges += ((a, b))
        state = state.map { case (w, f, s) => (w, f, mergeOnce(s, a, b)) }
          .localCheckpoint()
        i += 1
      }
    }
    merges.result()
  }

  /** Per-doc token counts under a trained merge list — the "how many
    * tokens is my corpus" question answered with the REAL tokenizer
    * instead of [[TextAnalysis.bpeTokenCount]]'s regex estimate. The
    * merge list broadcasts (it is vocab-sized); encoding is a typed
    * map over per-doc token arrays — imperative per-row logic, kept
    * out of the shuffle (the output is one long per doc). */
  def encodeTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    TextAnalysis.withTokens(docs, textCol)
      .select(col(idCol).cast("long"), col("tokens"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        (id, toks.map(w => applyMerges(w, bc.value).length.toLong).sum)
      }
      .toDF(idCol, "n_bpe_tokens")
  }
}
