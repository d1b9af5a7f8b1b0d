package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IR ranking-quality metrics — the evaluation that closes the
  * retrieval loop around E156's BM25 and the ANN search family: given
  * ranked results and a relevance set, per query the reciprocal rank
  * of the first relevant hit, precision@k and recall@k. The EXACT
  * members of the ranking-metric family (rationals in e6/permille —
  * floor division, engine-identical); nDCG's log2 discount is
  * transcendental and deliberately out of scope (the [[
  * graft.graph.LinkGraph]] exact-arithmetic discipline: state what
  * you compute, compute it exactly).
  *
  * Query universe is the UNION of result-queries and truth-queries:
  * a query with relevant docs but no results is a retrieval failure
  * that must surface as zeros, not vanish from the report (the audit
  * stance everywhere in this repo); a query with results but no
  * truth rows reports NULL recall (undefined, not zero — nothing was
  * asked for).
  *
  * Shape: one distinct on truth, one left join on (query, doc), one
  * query-keyed aggregate, one small full-outer join — all hash
  * operations on (query, doc)-sized frames; never the corpus. */
object Ranking {

  def rankingMetrics(results: DataFrame, truth: DataFrame, k: Int,
                     queryCol: String = "query_id",
                     docCol: String = "doc_id",
                     rankCol: String = "rank"): DataFrame = {
    require(k >= 1, "k must be positive")
    val rel = truth.select(col(queryCol), col(docCol)).distinct()
      .withColumn("__rel", lit(1))
    val nRel = rel.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_relevant"))
    val per = results.join(rel, Seq(queryCol, docCol), "left")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_results"),
        min(when(col("__rel").isNotNull, col(rankCol)))
          .as("first_rel_rank"),
        count(when(col("__rel").isNotNull && col(rankCol) <= k, 1))
          .as("hits_at_k"))
    per.join(nRel, Seq(queryCol), "full_outer")
      .select(col(queryCol),
        coalesce(col("n_results"), lit(0L)).as("n_results"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          expr("1000000 div first_rel_rank")).as("rr_e6"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        expr(s"(coalesce(hits_at_k, 0L) * 1000) div $k")
          .as("precision_at_k_permille"),
        when(col("n_relevant") > 0,
          expr("(coalesce(hits_at_k, 0L) * 1000) div n_relevant"))
          .as("recall_at_k_permille"))
  }
}
