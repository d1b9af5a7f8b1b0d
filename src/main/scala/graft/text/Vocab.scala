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
}
