package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filter — the Gopher/C4-style keep/drop
  * gate of an LLM data pipeline, expressed as auditable per-rule
  * booleans plus the combined verdict. A curation pipeline keeps the
  * full report (not just the survivors): the per-rule failure mix is
  * the signal that a source went bad.
  *
  * One narrow projection over the materialized token array — no
  * shuffle, no UDF; every rule is exact integer counting plus at most
  * one final division, so the report is bit-identical across engines.
  */
object QualityRules {

  /** Inclusive token-count bounds. */
  val minTokens = 30L
  val maxTokens = 100000L
  /** Mean-token-length band (printed-language heuristic). */
  val minAvgLen = 3.0
  val maxAvgLen = 4.6
  /** Max tolerated fraction of all-digit tokens. */
  val maxDigitRatio = 0.05
  /** Min lexical diversity (distinct / total tokens). */
  val minUniqueRatio = 0.4
  /** Min closed-class (stopword) hits across the supported languages. */
  val minStopHits = 1L

  /** Union stopword list over the supported languages — membership of
    * ANY closed-class word is the "looks like language" signal. */
  val allStopwords: Seq[String] =
    TextAnalysis.stopwords.values.flatten.toSeq.distinct.sorted

  /** Per-document rule report: the measured features, one boolean per
    * rule, and `keep` = all rules pass. */
  def ruleReport(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val t = col("__toks")
    val nTok = size(t).cast("long")
    val nUniq = size(array_distinct(t)).cast("long")
    val sumLen = aggregate(transform(t, length(_)), lit(0L), (a, x) => a + x)
    val nDigit = size(filter(t, _.rlike("^[0-9]+$"))).cast("long")
    val nStop = size(filter(t, _.isInCollection(allStopwords))).cast("long")
    val avgLen = sumLen.cast("double") / nTok.cast("double")
    val digitRatio = nDigit.cast("double") / nTok.cast("double")
    val uniqueRatio = nUniq.cast("double") / nTok.cast("double")
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(t) > 0)
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        avgLen.as("avg_token_len"),
        digitRatio.as("digit_ratio"),
        uniqueRatio.as("unique_ratio"),
        nStop.as("stop_hits"),
        (nTok >= minTokens && nTok <= maxTokens).as("len_ok"),
        (avgLen >= minAvgLen && avgLen <= maxAvgLen).as("word_len_ok"),
        (digitRatio <= maxDigitRatio).as("digit_ok"),
        (uniqueRatio >= minUniqueRatio).as("rep_ok"),
        (nStop >= minStopHits).as("stop_ok"))
      .withColumn("keep",
        col("len_ok") && col("word_len_ok") && col("digit_ok") &&
          col("rep_ok") && col("stop_ok"))
  }

  /** The gate's rule columns, in report order. */
  val ruleNames: Seq[String] =
    Seq("len_ok", "word_len_ok", "digit_ok", "rep_ok", "stop_ok")

  /** Rule ABLATION report — the marginal-value audit a curation team
    * runs before tuning any threshold: per rule, how many docs fail
    * it at all, how many fail it UNIQUELY (every other rule passes —
    * the docs this rule alone is killing, the rule's marginal kill
    * count), and the token mass those unique kills cost. A rule with
    * a large failure count but near-zero unique count is redundant
    * shadowing (its victims die anyway); a rule with a large unique
    * token cost is where threshold tuning buys data back. The same
    * decomposition C4/Gopher-style pipelines publish when justifying
    * each heuristic (Rae et al. 2021 arXiv:2112.11446 reports
    * per-filter removal rates).
    *
    * Exact integers off [[ruleReport]]'s booleans; one aggregate over
    * the report scan + a 5-row `stack` — output bounded by the rule
    * count, nothing by the corpus. */
  def ruleAblation(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val rpt = ruleReport(docs, idCol, textCol)
    val aggs = ruleNames.zipWithIndex.flatMap { case (r, i) =>
      val others = ruleNames.filterNot(_ == r).map(col).reduce(_ && _)
      Seq(
        sum(when(!col(r), 1L).otherwise(0L)).as(s"__f$i"),
        sum(when(!col(r) && others, 1L).otherwise(0L)).as(s"__u$i"),
        sum(when(!col(r) && others, col("n_tokens")).otherwise(0L))
          .as(s"__t$i"))
    }
    val stacked = ruleNames.zipWithIndex.map { case (r, i) =>
      s"'$r', __f$i, __u$i, __t$i" }.mkString(", ")
    rpt.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${ruleNames.size}, $stacked) AS " +
        "(rule, n_failing, n_unique_failing, tokens_lost_unique)"))
  }

  /** The filter itself: [[ruleReport]]'s survivors with their original
    * columns — as a SINGLE-SCAN filter, not a join. The rules are pure
    * per-row predicates, so self-joining the corpus against its own
    * report (the obvious composition) would read the table twice and
    * ship verdicts through a join for nothing; here the token array
    * materializes once behind a projection and the combined verdict is
    * one codegen'd filter — at 100 TB that halves the IO of the gate.
    * Semantics identical to `ruleReport.filter($"keep")`: an
    * empty-token doc fails `len_ok` either way (`idCol` retained for
    * signature stability; the row-level form doesn't need it). */
  def applyRules(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val t = col("__toks")
    val nTok = size(t).cast("long")
    val nUniq = size(array_distinct(t)).cast("long")
    val sumLen = aggregate(transform(t, length(_)), lit(0L), (a, x) => a + x)
    val nDigit = size(filter(t, _.rlike("^[0-9]+$"))).cast("long")
    val nStop = size(filter(t, _.isInCollection(allStopwords))).cast("long")
    val avgLen = sumLen.cast("double") / nTok.cast("double")
    val keep = nTok >= minTokens && nTok <= maxTokens &&
      avgLen >= minAvgLen && avgLen <= maxAvgLen &&
      nDigit.cast("double") / nTok.cast("double") <= maxDigitRatio &&
      nUniq.cast("double") / nTok.cast("double") >= minUniqueRatio &&
      nStop >= minStopHits
    docs.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .filter(keep).drop("__toks")
  }
}
