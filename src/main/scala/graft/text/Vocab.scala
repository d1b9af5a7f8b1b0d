package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-vocabulary operators for LLM training-data pipelines: global
  * token ranking, rank-based document scoring (the exact-arithmetic
  * stand-in for unigram-LM surprisal — rarer vocabulary ⇒ higher mean
  * rank), and out-of-vocabulary coverage against a frozen top-k vocab
  * (the tokenizer-coverage audit).
  *
  * Scale shape:
  *  - the vocabulary is Zipf-bounded (tens of millions of types even
  *    at web scale, independent of corpus row count), so ranking it is
  *    a single-partition sort of a SMALL aggregate, and the top-k slice
  *    is explicitly broadcast into the per-token join;
  *  - per-document scores ride the explode → join → hash-aggregate
  *    pipeline: the exploded token rows combine map-side before the
  *    doc_id shuffle, and only (token, rank) pairs cross the wire for
  *    the join.
  *
  * Determinism: ranks are total-ordered by (count DESC, token), so
  * every output is exact integer arithmetic plus one final division —
  * bit-identical across engines.
  */
object Vocab {

  /** Global token ranking: rank 1 = most frequent, ties broken by the
    * token text. The rank's window has no partition — the input here
    * is the ALREADY-AGGREGATED vocabulary (one row per type, Zipf-
    * bounded), not the corpus, so the single-partition sort is safe. */
  def tokenRanks(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    TextAnalysis.tokenStats(docs, idCol, textCol)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("occurrences").desc, col("token"))))

  /** Per-document vocabulary-rank profile: instance-weighted mean
    * corpus rank (the quality proxy — common-word text scores low,
    * rare-vocabulary text scores high), the rarest token's rank, and
    * the distinct-type count. */
  def docRankProfile(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val ranks = tokenRanks(docs, idCol, textCol).select(col("token"), col("rank"))
    TextAnalysis.withTokens(docs, textCol)
      .select(col(idCol).as("doc_id"), explode(col("tokens")).as("token"))
      .join(ranks, "token")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("n_types"),
        sum(col("rank")).as("rank_sum"),
        max(col("rank")).as("rarest_rank"))
      .withColumn("mean_rank",
        col("rank_sum").cast("double") / col("n_tokens").cast("double"))
  }

  /** Top-k vocabulary by corpus frequency (deterministic tie-break on
    * the token text) — the frozen vocab a tokenizer ships with. */
  def topVocab(docs: DataFrame, k: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(k > 0, "vocab size must be positive")
    tokenRanks(docs, idCol, textCol).filter(col("rank") <= k).select(col("token"))
  }

  /** Per-document out-of-vocabulary audit against a top-k vocab:
    * token-instance OOV count and rate. The vocab side is k rows by
    * construction — broadcast, so the per-token probe is map-side and
    * the only shuffle is the final doc_id aggregate. */
  def oovProfile(docs: DataFrame, vocabSize: Int = 500,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val vocab = broadcast(topVocab(docs, vocabSize, idCol, textCol)
      .withColumn("__in_vocab", lit(true)))
    TextAnalysis.withTokens(docs, textCol)
      .select(col(idCol).as("doc_id"), explode(col("tokens")).as("token"))
      .join(vocab, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Heaps'-law vocabulary-growth curve (Heaps 1978; Baeza-Yates &
    * Ribeiro-Neto §6.5) per group: K checkpoints along the
    * doc_id-ordered corpus prefix, each reporting cumulative docs,
    * token instances, and DISTINCT types seen so far — the curve
    * whose flattening says "more of the same corpus buys no new
    * vocabulary" (tokenizer sizing, crawl-source saturation audits).
    * All exact integers: a type counts toward checkpoint b iff its
    * first-appearance doc (min doc_id) falls at or before b's last
    * doc — no per-prefix distinct scans, the cumulative-distinct
    * identity does the work.
    *
    * Scale shape: checkpoint assignment is one per-group window rank
    * over docs (unique doc_id ⇒ deterministic; the quantileFeatures
    * per-group-sort cost, parallel across groups); first appearances
    * are one (group, token) min-aggregate over the exploded corpus
    * (map-side combinable, output Zipf-bounded); the only other
    * shuffles are two (group, bucket) aggregates and the final
    * cumulative window, which ranges over K CHECKPOINTS per group —
    * never the corpus. */
  def heapsCurve(docs: DataFrame, k: Int = 20, idCol: String = "doc_id",
                 textCol: String = "text",
                 groupCol: String = "lang"): DataFrame = {
    require(k >= 1, "need at least one checkpoint")
    val toks = TextAnalysis.withTokens(docs, textCol)
      .select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        col("tokens"))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("grp"))
    val bucketed = toks
      .select(col("grp"), col("doc_id"), size(col("tokens")).as("n_tokens"))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bucket",
        (expr(s"((__rn - 1) * $k) div __n") + 1).cast("int"))
    val firstDoc = toks
      .select(col("grp"), col("doc_id"), explode(col("tokens")).as("token"))
      .groupBy(col("grp"), col("token"))
      .agg(min(col("doc_id")).as("doc_id"))
    val newTypes = firstDoc
      .join(bucketed.select(col("grp"), col("doc_id"), col("bucket")),
        Seq("grp", "doc_id"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("__new_types"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("__docs"), sum(col("n_tokens")).as("__toks"))
      .join(newTypes, Seq("grp", "bucket"), "left")
      .na.fill(0L, Seq("__new_types"))
      .withColumn("cum_docs", sum(col("__docs")).over(wCum))
      .withColumn("cum_tokens", sum(col("__toks")).over(wCum))
      .withColumn("cum_types", sum(col("__new_types")).over(wCum))
      .select(col("grp").as(groupCol), col("bucket"),
        col("cum_docs"), col("cum_tokens"), col("cum_types"))
  }

  /** Vocabulary trend between corpus snapshots — the drift view a
    * crawl pipeline reviews between batches: per batch, the top-`k`
    * tokens by count with their rank movement against the PREVIOUS
    * batch (rank_delta > 0 = rising) and a new-entrant flag (token
    * absent from the previous batch's vocabulary entirely — not
    * merely outside its top-k, which would fake "new" every time a
    * token crossed the cut). The between-snapshot complement to
    * [[heapsCurve]]'s within-corpus growth and E48's frequency
    * profile.
    *
    * Ranks use (count DESC, token) — a total order. Shape: one
    * exploded count aggregate (map-side combinable, Zipf-bounded
    * output), one rank window per batch over the COUNT table, a
    * (token, prev-batch) self equi-join of that table, top-k filter.
    * Nothing heavier than the vocabulary ever shuffles. */
  def vocabTrend(docs: DataFrame, batchCol: String, k: Int = 20,
                 textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = TextAnalysis.withTokens(docs, textCol)
      .select(col(batchCol).as("batch"), explode(col("tokens")).as("token"))
      .groupBy(col("batch"), col("token")).agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("rank",
      row_number().over(Window.partitionBy(col("batch"))
        .orderBy(col("cnt").desc, col("token"))).cast("long"))
    val prev = ranked.select((col("batch") + 1).as("batch"),
      col("token"), col("rank").as("prev_rank"))
    ranked.filter(col("rank") <= k)
      .join(prev, Seq("batch", "token"), "left")
      .select(col("batch"), col("rank"), col("token"), col("cnt"),
        col("prev_rank"),
        (col("prev_rank") - col("rank")).as("rank_delta"),
        col("prev_rank").isNull.as("is_new"))
  }

  /** Good–Turing frequency re-estimation over the corpus vocabulary
    * (Good, Biometrika 1953; the counts-of-counts device behind
    * Katz/absolute-discount smoothing and species-richness
    * estimation): N_r = how many word TYPES occur exactly r times;
    * the raw Turing estimate r* = (r+1)·N_{r+1}/N_r re-allocates mass
    * toward unseen events, and p₀ = N₁/N is the classic unseen-mass
    * share (the "how much probability belongs to words we have never
    * seen" answer a corpus card wants next to [[heapsCurve]]).
    *
    * Exact BIGINT throughout: r* in floor-quantized micro-units
    * ((r+1)·N_{r+1}·1e6 div N_r — bounded by maxFreq·|V|·1e6, far
    * under 2^63 at any corpus since N_{r+1} shrinks as r grows), p₀
    * in permille. r* is NULL where N_{r+1} = 0 — the raw estimate's
    * gaps; SIMPLE Good–Turing fills them by log-log regression (Gale
    * & Sampson 1995), a driver-side fit over THIS (r, N_r) table,
    * out of scope and stated. Shape: one token aggregate → one
    * counts-of-counts aggregate (output ≤ distinct-frequency count,
    * Zipf-tiny) → one broadcast 1-row total. */
  def goodTuringCounts(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val freqs = TextAnalysis.tokenStats(docs, idCol, textCol)
      .select(col("occurrences").as("r"))
    val nr = freqs.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val tot = nr.agg(
      sum(col("r") * col("n_r")).as("__n"),
      sum(when(col("r") === 1, col("n_r")).otherwise(lit(0L))).as("__n1"))
    val nextNr = nr.select((col("r") - 1).as("r"), col("n_r").as("__nr_next"))
    nr.join(nextNr, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        when(col("__nr_next").isNotNull,
          expr("((r + 1) * __nr_next * 1000000) div n_r"))
          .as("turing_micro"),
        expr("(__n1 * 1000) div __n").as("p0_permille"))
  }

  /** Chao1 species-richness estimate (Chao, Scand. J. Statist. 1984;
    * the bias-corrected form) — "how many word types does the
    * population hold, given what the sample showed?", the
    * extrapolation companion to [[goodTuringCounts]]' unseen-MASS
    * share and [[heapsCurve]]' growth curve: Ŝ = S_obs +
    * N₁(N₁−1) / (2(N₂+1)), driven entirely by the singleton/doubleton
    * counts (a corpus rich in hapaxes hides many unseen types). Exact
    * BIGINT in floor-quantized micro-units; the bias-corrected form
    * is total where the classic N₁²/(2N₂) breaks at N₂ = 0, stated.
    * The N₁²·1e6 intermediate runs in DECIMAL(38,0) (the q343
    * convention — int64 would wrap silently past N₁ ≈ 3·10⁶ hapaxes,
    * well inside web-corpus range); the result fits BIGINT at any
    * vocabulary. One token aggregate → one 4-scalar fold — a single
    * summary row. */
  def chao1Richness(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    TextAnalysis.tokenStats(docs, idCol, textCol)
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("occurrences") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("occurrences") === 2, 1L).otherwise(0L)).as("n2"),
        sum(col("occurrences")).as("n_tokens"))
      .withColumn("chao1_micro",
        expr("""CAST(CAST(s_obs AS DECIMAL(38,0)) * 1000000 +
          (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1) * 1000000)
            div (2 * (n2 + 1)) AS BIGINT)"""))
}
