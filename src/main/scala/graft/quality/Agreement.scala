package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the label-quality gate for human- or
  * model-labeled training data (reference anchor: the validators'
  * scalar-probe contract, validate.py:41 — this is the same
  * one-row-report shape over a doubly-labeled table).
  *
  * Cohen's kappa (Cohen, Educ. Psychol. Meas. 1960) corrects raw
  * agreement for the agreement two raters would reach by chance given
  * their own label marginals: κ = (p_o − p_e) / (1 − p_e) with
  * p_o = Σ diag / N and p_e = Σ rowᵢ·colᵢ / N². Raw agreement alone
  * rewards raters who both spam the majority label; κ is the standard
  * "is the labeling pipeline actually consistent" number reviewers
  * ask for before a labeled set ships.
  *
  * Everything is EXACT integer arithmetic: the confusion matrix and
  * marginals are counts, and κ is emitted as a floor permille of the
  * integer identity κ‰ = ⌊1000·(N·agree − Σrc) / (N² − Σrc)⌋ using
  * the nonneg-mod floor identity on both engines (κ is NEGATIVE when
  * raters agree less than chance — a plain truncating `div` would
  * round toward zero there; see the q240 trap). N ≤ 3·10⁹ keeps
  * N² inside a long.
  *
  * Shape: one hash aggregate over (a, b) cells — output bounded by
  * the label-domain square, never the corpus — then marginal products
  * on the tiny cell table. Null-labeled items are excluded (stated:
  * an unlabeled item is a coverage problem, not a disagreement).
  * Fleiss' generalization for >2 raters is [[Agreement.fleissKappa]]
  * below. */
object Agreement {

  /** One row: (n_items, n_agree, agree_permille, pe_permille,
    * kappa_permille — NULL when p_e = 1, the degenerate
    * single-label-both-raters case where κ is undefined). */
  def cohenKappa(df: DataFrame, raterACol: String,
                 raterBCol: String): DataFrame = {
    val cells = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
    val rowsM = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__na"))
    val colsM = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__nb"))
    val totals = cells.agg(
      sum(col("__n")).as("n_items"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("n_agree"))
    // Σ rowᵢ·colᵢ over the shared label domain; labels one rater
    // never used contribute 0 and drop out of the inner join.
    val rc = rowsM.join(colsM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__rc"))
    totals.crossJoin(broadcast(rc)) // two 1-row frames
      .withColumn("agree_permille",
        expr("(1000 * n_agree) div n_items"))
      .withColumn("pe_permille",
        expr("(1000 * __rc) div (n_items * n_items)"))
      .withColumn("kappa_permille", expr(
        """CASE WHEN n_items * n_items - __rc <> 0 THEN
          |  (1000 * (n_items * n_agree - __rc)
          |   - pmod(1000 * (n_items * n_agree - __rc),
          |          n_items * n_items - __rc))
          |  div (n_items * n_items - __rc)
          |END""".stripMargin))
      .select("n_items", "n_agree", "agree_permille", "pe_permille",
        "kappa_permille")
  }

  /** Chi-square contingency association — the INDEPENDENCE
    * counterpart to [[cohenKappa]]'s agreement (kappa asks "do two
    * raters say the SAME thing"; this asks "are two categorical
    * columns related at all" — label×source leakage checks, segment×
    * status dependence, stratification sanity). Exact integers via
    * the identity χ² = Σcells (o−e)²/e = N·Σ o²/(rᵢ·cⱼ) − N: the
    * second form touches ONLY observed cells (empty cells of the
    * cross product contribute exactly their expectation and cancel
    * into the −N term), so no |A|×|B| materialization ever happens —
    * the aggregate is one pass over the observed cell table, itself
    * bounded by the label-domain product, never the corpus.
    *
    * Emitted as χ²_e6 with a stated per-cell floor (both engines
    * floor each cell's 10⁶·N·o² div (r·c) then sum — a DEFINED
    * statistic, deterministic everywhere), plus Cramér's V² in floor
    * permille (V needs a sqrt; V² is the exact rational — threshold
    * on V² instead, monotone in V). DECIMAL(38,0) holds the per-cell
    * product for N up to ~4·10¹⁰. NULL-in-either rows are excluded
    * (stated). Returns one row: (n, n_a, n_b, dof, chi2_e6,
    * v2_permille — NULL when either column is constant, where
    * association is undefined). */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__cb"))
    val tot = cells.agg(sum(col("__o")).as("__N"))
    cells.join(ra, "__a").join(cb, "__b")
      .crossJoin(broadcast(tot))
      .agg(max(col("__N")).as("n"),
        countDistinct(col("__a")).as("n_a"),
        countDistinct(col("__b")).as("n_b"),
        sum(expr("""(CAST(1000000 AS DECIMAL(38,0)) * __N * __o * __o)
          div (__ra * __cb)""")).as("__t"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        expr("CAST(__t - CAST(1000000 AS DECIMAL(38,0)) * n AS BIGINT)")
          .as("chi2_e6"))
      .withColumn("v2_permille", expr(
        """CASE WHEN least(n_a - 1, n_b - 1) > 0 THEN
          |  chi2_e6 div (1000 * n * least(n_a - 1, n_b - 1))
          |END""".stripMargin))
  }

  /** Fleiss' kappa (Fleiss, Psychological Bulletin 1971) — the
    * MULTI-rater agreement [[cohenKappa]]'s doc promised: n raters
    * label every item (the annotation-pool shape an RLHF/eval
    * labeling pipeline actually runs — Cohen's pairwise κ doesn't
    * apply), chance-corrected by the pooled label marginals:
    * κ = (P̄ − P̄_e)/(1 − P̄_e) with per-item agreement
    * P_i = Σ_k n_ik(n_ik−1)/(n(n−1)) and P̄_e = Σ_k p_k².
    *
    * EVERYTHING exact: with A = Σ_i Σ_k n_ik(n_ik−1),
    * B = Σ_k (Σ_i n_ik)², D = N·n·(n−1), E = (N·n)², the emission is
    * P̄ = A/D, P̄_e = B/E, and κ = (A·E − B·D)/(D·(E−B)) — integer
    * micro-units via the nonneg-mod floor identity (κ is NEGATIVE
    * below chance; a truncating div would round it the wrong way —
    * the cohenKappa/q240 trap), DECIMAL(38,0) throughout (E = (N·n)²
    * passes int64 at N·n ≈ 3·10⁹ — web-scale pools exceed that,
    * stated). κ is NULL when E = B, the degenerate everyone-says-
    * the-one-label case.
    *
    * The constant-raters-per-item requirement is Fleiss' own; it is
    * enforced LOUDLY with one config-sized action (min/max ratings
    * per item) — a silently ragged panel would make D a lie. NULL
    * items/labels are excluded before the check (stated, the
    * cohenKappa convention). Shape: one (item, label) aggregate, one
    * per-item and one per-label rollup — output bounded by the label
    * domain, never the ratings volume. */
  def fleissKappa(ratings: DataFrame, itemCol: String,
                  labelCol: String): DataFrame = {
    val cells = ratings
      .filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .select(col(itemCol).cast("string").as("__i"),
        col(labelCol).cast("string").as("__k"))
      .groupBy(col("__i"), col("__k")).agg(count(lit(1)).as("__n"))
    val perItem = cells.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__ni"),
        sum(col("__n") * (col("__n") - 1)).as("__si"))
    val bounds = perItem.agg(min(col("__ni")), max(col("__ni"))).head
    require(!bounds.isNullAt(0),
      "fleissKappa needs at least one non-null-labeled item (input " +
        "is empty after the null filter)")
    val nRaters = bounds.getLong(0)
    require(nRaters == bounds.getLong(1),
      s"fleissKappa needs a CONSTANT rater count per item, got " +
        s"[${bounds.getLong(0)}, ${bounds.getLong(1)}] — filter the " +
        "panel to complete items first")
    require(nRaters >= 2, s"need >= 2 raters per item, got $nRaters")
    val itemAgg = perItem.agg(count(lit(1)).as("n_items"),
      sum(col("__si")).cast("decimal(38,0)").as("__A"))
    val labelAgg = cells.groupBy(col("__k"))
      .agg(sum(col("__n")).as("__ck"))
      .agg(count(lit(1)).as("n_labels"),
        sum(col("__ck").cast("decimal(38,0)") * col("__ck"))
          .as("__B"))
    itemAgg.crossJoin(broadcast(labelAgg)) // two 1-row frames
      .withColumn("n_raters", lit(nRaters))
      .withColumn("__D", expr(
        s"CAST(n_items AS DECIMAL(38,0)) * $nRaters * (${nRaters} - 1)"))
      .withColumn("__E", expr(
        s"CAST(n_items AS DECIMAL(38,0)) * $nRaters " +
          s"* CAST(n_items AS DECIMAL(38,0)) * $nRaters"))
      .withColumn("p_bar_micro", expr("(1000000 * __A) div __D"))
      .withColumn("pe_micro", expr("(1000000 * __B) div __E"))
      .withColumn("kappa_micro", expr(
        """CASE WHEN __E <> __B THEN CAST(
          |  (1000000 * (__A * __E - __B * __D)
          |   - pmod(1000000 * (__A * __E - __B * __D),
          |          __D * (__E - __B)))
          |  div (__D * (__E - __B)) AS BIGINT)
          |END""".stripMargin))
      .select(col("n_items"), col("n_raters"), col("n_labels"),
        expr("CAST(p_bar_micro AS BIGINT)").as("p_bar_micro"),
        expr("CAST(pe_micro AS BIGINT)").as("pe_micro"),
        col("kappa_micro"))
  }
}
