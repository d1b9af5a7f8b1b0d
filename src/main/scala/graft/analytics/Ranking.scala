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

  /** Average precision per query (the area under the precision–recall
    * curve, summed form) — the PR-family member [[rankingMetrics]]'s
    * P@k/RR and [[rocAuc]] leave open: ROC-AUC is insensitive to the
    * class skew retrieval lives under (a ranker can hold AUC ≈ 0.9
    * while burying every relevant doc past rank 100 when negatives
    * dominate); AP = (1/R)·Σ_{k : rel_k} P@k weights precision AT the
    * relevant hits, which is what a searcher experiences.
    *
    * Exactness convention (the chi-square per-cell-floor device,
    * stated): each P@k term floors independently at e6 —
    * ap_e6 = (Σ_{rel hits} floor(10⁶·cumHits(k) / k)) div R — a
    * DEFINED deterministic statistic both engines replay bit-for-bit;
    * the true rational differs by < 1e-6·hits/R. R counts ALL
    * relevant docs from the truth set (standard AP: un-retrieved
    * relevant docs drag the score — a ranker can't improve by
    * truncating its result list). Ranks must be a total order per
    * query (the caller's rank column, as in [[rankingMetrics]]).
    * Zero relevant docs → NULL AP (undefined, not zero); a query
    * with relevant docs but no results reports ap_e6 = 0 — a
    * retrieval failure must surface, not vanish (the audit stance).
    *
    * Shape: one distinct on truth, one left join on (query, doc), a
    * query-partitioned rank window over RESULT rows (result lists
    * are k-bounded by contract — never corpus-sized), one aggregate,
    * one small full-outer join. */
  def averagePrecision(results: DataFrame, truth: DataFrame,
                       queryCol: String = "query_id",
                       docCol: String = "doc_id",
                       rankCol: String = "rank"): DataFrame = {
    val rel = truth.select(col(queryCol), col(docCol)).distinct()
      .withColumn("__rel", lit(1))
    val nRel = rel.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_relevant"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col(rankCol))
    val per = results.join(rel, Seq(queryCol, docCol), "left")
      .withColumn("__hit", when(col("__rel").isNotNull, 1L).otherwise(0L))
      .withColumn("__cum", sum(col("__hit")).over(w))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_results"),
        sum(col("__hit")).as("n_hits"),
        sum(when(col("__hit") === 1L,
          expr(s"(1000000 * __cum) div $rankCol")).otherwise(0L))
          .as("__ap_num"))
    per.join(nRel, Seq(queryCol), "full_outer")
      .select(col(queryCol),
        coalesce(col("n_results"), lit(0L)).as("n_results"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_relevant"), lit(0L)) > 0,
          expr("coalesce(__ap_num, 0L) div n_relevant")).as("ap_e6"))
  }

  /** Isotonic calibration repair (L2 isotonic regression of the
    * per-score positive rate) — the FIX for what [[calibrationTable]]
    * audits: a monotone score whose probabilities are off gets
    * remapped to the best monotone-non-decreasing rate curve
    * (Robertson et al. 1988; the standard classifier-calibration
    * method of Zadrozny & Elkan KDD 2002).
    *
    * Computed via the minimax identity — fit(i) = max_{j≤i} min_{k≥i}
    * mean(rate over bins j..k) — rather than the sequential
    * pool-adjacent-violators sweep, because the identity is pure
    * joins/windows over the BIN table and the bin table is BOUNDED:
    * scores are integer units (the calibrationTable permille
    * contract), so B ≤ units+1 distinct bins regardless of corpus
    * size, and the B² pair frame is a constant-size object (≤ ~10⁶
    * rows at permille resolution) — never corpus-scaled.
    *
    * Exactness convention (stated, the chi-square per-cell device):
    * pooled means floor at e6 — A(j,k) = (10⁶·ΣP) div (ΣN) — and the
    * minimax runs over the FLOORED matrix. Monotonicity survives the
    * floor for ANY matrix (min over fewer k and max over more j are
    * both monotone in i — proof in one line), so the output is still
    * a valid monotone calibration map; it differs from the true
    * rational fit by < 1 e6-unit per pooled block.
    *
    * Shape: one hash aggregate to bins → one ordered window over B
    * rows (prefix sums) → one range self-join to the B² pair frame →
    * one reverse running-min window (partition j) → one (i)-keyed max
    * aggregate → one join back to bins. Output = B rows:
    * (score, n, n_pos, raw_rate_e6, iso_rate_e6). */
  def isotonicCalibration(scored: DataFrame, labelCol: String,
                          scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
    // B bins: an unpartitioned window over the bin table is a
    // bounded-frame operation (the liftTable precedent), not the
    // corpus-window trap
    val bins = scored
      .select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
      .withColumn("__i", row_number().over(w))
      .withColumn("__cn", sum(col("__n")).over(w))
      .withColumn("__cp", sum(col("__p")).over(w))
      .localCheckpoint()
    val j = bins.select(col("__i").as("__j"),
      (col("__cn") - col("__n")).as("__cnj"),
      (col("__cp") - col("__p")).as("__cpj"))
    val k = bins.select(col("__i").as("__k"),
      col("__cn").as("__cnk"), col("__cp").as("__cpk"))
    val pairs = j.join(k, col("__j") <= col("__k"))
      .select(col("__j"), col("__k"),
        expr("(1000000 * (__cpk - __cpj)) div (__cnk - __cnj)").as("__a"))
    // running min from the right = growing frame under the REVERSED
    // sort (the round-14 window-frame rule: an unbounded-FOLLOWING
    // frame is the O(n²) shrinking-frame processor)
    val wRevMin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__j")).orderBy(col("__k").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val fit = pairs
      .withColumn("__m", min(col("__a")).over(wRevMin))
      .groupBy(col("__k").as("__i"))
      .agg(max(col("__m")).as("iso_rate_e6"))
    bins.join(fit, "__i")
      .select(col("__s").as("score"), col("__n").as("n"),
        col("__p").as("n_pos"),
        expr("(1000000 * __p) div __n").as("raw_rate_e6"),
        col("iso_rate_e6"))
  }

  /** EXACT ROC-AUC via the Mann–Whitney rank-sum identity — the
    * threshold-free binary-classifier metric next to [[
    * rankingMetrics]]'s IR family: AUC = P(score⁺ > score⁻) + ½
    * P(tie) = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) where R⁺ is the sum of
    * average ranks of the positives. No ROC curve is materialized and
    * no threshold sweep runs — the rank identity IS the area.
    *
    * Scale shape (the reason this isn't three lines): average ranks
    * need the global sort order, and `rank().over(Window.orderBy)` is
    * the single-partition trap. Instead: (1) one hash aggregate to
    * per-DISTINCT-SCORE groups (n_s rows, p_s positives) — ties
    * collapse here, so the sort that follows is over distinct scores,
    * not rows; (2) [[Distributed.prefixSums]] (the E223 device
    * generalized to prefix-SUM) yields c_s = rows strictly below s,
    * fully distributed;
    * (3) each group contributes p_s·(2c_s + n_s + 1) to 2R⁺ (its
    * positives share average rank c_s + (n_s+1)/2 — kept ×2 so
    * everything stays integral). DECIMAL(38,0) accumulation: 2R⁺ is
    * O(n²) and the ×10⁶ scaling would overflow BIGINT near 10⁹ rows.
    *
    * Returns one row: n, n_pos, n_neg, n_distinct_scores, auc_e6
    * (floor micro-units; NULL when either class is empty — AUC is
    * undefined, not 500000). */
  def rocAuc(scored: DataFrame, labelCol: String,
             scoreCol: String): DataFrame = {
    val g = scored
      .select(col(scoreCol).as("__s"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    Distributed.prefixSums(g, "__s", Seq("__n"))
      .withColumn("__c", col("__n_cum") - col("__n"))
      .agg(sum(col("__n")).as("n"), sum(col("__p")).as("n_pos"),
        count(lit(1)).as("n_distinct_scores"),
        sum(col("__p").cast("decimal(38,0)") *
          (lit(2L) * col("__c") + col("__n") + lit(1L))).as("__sum2r"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        col("n_distinct_scores"),
        expr("""CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
          CAST((CAST(1000000 AS DECIMAL(38,0)) *
            (__sum2r - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)))
            div (CAST(2 AS DECIMAL(38,0)) * n_pos * (n - n_pos))
            AS BIGINT) END""").as("auc_e6"))
  }

  /** Cumulative gains / lift table — the targeting view between
    * [[rocAuc]] (one rank-quality number) and [[calibrationTable]]
    * (probability honesty): "if we act on the top k% by score, what
    * share of all positives do we capture, and how much better than
    * random is that" — the campaign-targeting / review-queue-sizing
    * report. Rows are cut into `nBuckets` equal-size buckets by
    * DESCENDING score (ties broken by the stated unique id — a total
    * order, so both engines cut identically); per bucket: counts,
    * positives, exact permille rate, cumulative gain (share of all
    * positives captured so far) and cumulative lift vs the base rate,
    * all floor-integer rationals: lift‰ = (cumPos·N·1000) div
    * (cumRows·P).
    *
    * Shape: the global descending order comes from E223
    * globalRowIndex (never a single-partition window over rows); the
    * cumulative pass runs over the nBuckets-row aggregate, where an
    * unpartitioned window is a constant-size frame, not a trap.
    * Returns nBuckets rows (fewer when n < nBuckets). */
  def liftTable(scored: DataFrame, labelCol: String, scoreCol: String,
                idCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val base = scored.select(col(idCol).as("__id"),
        col(scoreCol).as("__s"), col(labelCol).cast("long").as("__y"))
      .withColumn("__sneg", -col("__s"))
    val idx = graft.etl.Packing.globalRowIndex(base,
      Seq("__sneg", "__id"))
    val tot = idx.agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    val byBucket = idx.crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"((row_idx - 1) * $nBuckets) div __n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"),
        max(col("__n")).as("__n"), max(col("__p")).as("__p"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    byBucket
      .withColumn("cum_rows", sum(col("n_rows")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        expr("(n_pos * 1000) div n_rows").as("rate_permille"),
        col("cum_rows"), col("cum_pos"),
        expr("CASE WHEN __p > 0 THEN (cum_pos * 1000) div __p END")
          .as("gain_permille"),
        expr("""CASE WHEN __p > 0 THEN
          (cum_pos * __n * 1000) div (cum_rows * __p) END""")
          .as("lift_permille"))
  }

  /** Calibration / reliability table — does a score MEAN what it says
    * ("0.7" should come true 70% of the time), the property [[rocAuc]]
    * deliberately ignores (AUC is rank-only: doubling every score
    * changes calibration, not AUC). Input probabilities are integer
    * permille (the repo's money-in-cents discipline for scores — the
    * caller quantizes once, both engines agree forever). Per
    * equal-width bin: n, positives, mean claimed confidence
    * (floor permille), empirical rate (floor permille), |gap|, and the
    * bin's Brier contribution mean (p − 1000y)² in e6 — all exact
    * integers. One hash aggregate over nBins groups; nothing sorted,
    * nothing collected. Bin 1000 permille clamps into the top bin
    * (a closed upper edge, stated). */
  def calibrationTable(scored: DataFrame, labelCol: String,
                       probCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    scored
      .select(col(probCol).cast("long").as("__p"),
        col(labelCol).cast("long").as("__y"))
      .withColumn("bin",
        least(expr(s"(__p * $nBins) div 1000"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        expr("sum(__p) div count(1)").as("conf_permille"),
        expr("(sum(__y) * 1000) div count(1)").as("rate_permille"),
        expr("sum((__p - 1000 * __y) * (__p - 1000 * __y)) div count(1)")
          .as("brier_e6"))
      .withColumn("gap_permille",
        abs(col("conf_permille") - col("rate_permille")))
  }

  /** 2-D Pareto frontier / skyline (Börzsönyi, Kossmann & Stocker,
    * ICDE 2001) — the rows no other row beats on BOTH axes: the
    * multi-criteria shortlist behind "best docs by quality AND
    * freshness", "cheapest AND fastest supplier", hyperparameter
    * fronts. Row b is dominated iff some a has a.x ≥ b.x ∧ a.y ≥ b.y
    * with at least one strict; the skyline is everything undominated.
    *
    * The textbook test is the all-pairs NOT EXISTS — quadratic and
    * unshippable. In 2-D dominance factorizes along one sorted axis:
    * with gmax(x) = max y at that exact x and M(x) = max y over all
    * STRICTLY GREATER x, row (x, y) is dominated iff M(x) ≥ y (a
    * better-x point matches y) or gmax(x) > y (an equal-x point beats
    * y). So the whole operator is one distinct-x aggregate, one
    * exclusive prefix max over the sorted distinct-x table
    * ([[Distributed.exclusivePrefixMax]] — range-partitioned, never a
    * single-partition window), and one join back. Exact-duplicate
    * points dominate each other in neither direction and both
    * survive — the standard skyline convention, spec-pinned.
    *
    * Scale: the sorted object is DISTINCT x values (not rows); the
    * join back is a hash join on x, broadcastable when the frontier
    * input is a pre-aggregated frame. Maximization on both axes —
    * negate a column to minimize it (stated, not parameterized). */
  /** Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    * — the standard way to combine rankings from INCOMMENSURABLE
    * scorers (BM25 units vs cosine vs a quantized integer dot: their
    * scores share no scale, their RANKS do): per system, a doc at
    * rank r contributes 1/(k₀+r); the fused order is by the summed
    * contribution. The hybrid-retrieval workhorse — lexical + dense
    * legs fused without training a single weight.
    *
    * Exactness: each contribution is the e6 FLOOR 10⁶ div (k₀+r) —
    * an exact integer (stated variant of the published 1/(k₀+r);
    * monotone in r, so per-system order is preserved; sums stay
    * BIGINT and hash-equal cross-engine). Ties on the fused sum
    * break by doc id ascending (stated). A doc absent from a system
    * contributes nothing for it — the published convention; the
    * `n_systems` column reports the support so a consumer can see
    * single-leg wins.
    *
    * Inputs: one frame per system, each with ≤ 1 row per
    * (query, doc) — (`queryCol`, `docCol`, `rankCol`), rank ≥ 1 and
    * dense within a query (the shape every top-k in this repo emits).
    * Shape: union of the k-bounded result lists (NEVER the corpus) →
    * one (query, doc) hash aggregate → one per-query top-k window
    * (WindowGroupLimit). Linear in Σ list sizes at any corpus scale. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], rrfK: Int = 60,
                           topK: Int = 10,
                           queryCol: String = "query_id",
                           docCol: String = "doc_id",
                           rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK >= 1, "rrfK must be >= 1 (k0 = 0 at rank 0 divides by zero;" +
      " the published constant is 60)")
    require(topK >= 1, "topK must be >= 1")
    val legs = rankings.map(_.select(
      col(queryCol).as("query_id"), col(docCol).as("doc_id"),
      expr(s"1000000L div (CAST(`$rankCol` AS BIGINT) + $rrfK)").as("__c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_e6").desc, col("doc_id"))
    legs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf_e6"), count(lit(1)).as("n_systems"))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
  }

  def skyline(rows: DataFrame, xCol: String, yCol: String): DataFrame = {
    val gm = rows.groupBy(col(xCol)).agg(max(col(yCol)).as("__gmax"))
      .withColumn("__negx", col(xCol) * lit(-1L))
    val withM = Distributed.exclusivePrefixMax(gm, "__negx", "__gmax", "__m")
      .select(col(xCol), col("__gmax"), col("__m"))
    rows.join(withM, Seq(xCol))
      .filter((col("__m").isNull || col("__m") < col(yCol)) &&
        !(col("__gmax") > col(yCol)))
      .drop("__gmax", "__m")
  }
}
