package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-value segmentation over an order history — RFM
  * (recency / frequency / monetary), the classic marketing-analytics
  * rollup (Hughes, *Strategic Database Marketing* 1994) and the
  * canonical "score entities by rank along several measures" shape:
  * per customer, days since last order, order count, exact lifetime
  * spend, each banded into k quantile scores (5 = best), composed
  * into the familiar 3-digit RFM cell.
  *
  * Reference scope: the reference pipeline has no segmentation
  * operator; this extends the TPC-H-ish bar/order surface the same
  * way the E-series extends documents.
  *
  * Determinism — no `ntile`: SQL-standard ntile breaks ties by row
  * order, which is partitioning-dependent on equal values. Bands here
  * are a pure function of the VALUE: band(v) = (k · |{rows < v}|)
  * div n + 1 — tied values always share a band, every step is
  * integer arithmetic, and the result is bit-identical on any engine
  * and any partitioning (the q145 tie-sharing contract applied to a
  * global frame).
  *
  * Scale shape: one per-customer hash aggregate (output bounded by
  * the customer universe), a 1-row anchor aggregate broadcast back,
  * then one band join per dimension. Each band table is built from a
  * counts-of-values aggregate and a window over DISTINCT SURROGATE
  * VALUES ONLY — recency in days (bounded by the date span), order
  * counts (bounded by the max orders per customer), and spend
  * quantized to hundred-dollar bands (bounded by the price range) —
  * so the unpartitioned cumulative window ranges over a value
  * domain, never the customer table (the q129 counts-of-counts
  * argument; the scaladoc states the bound because the operator goes
  * weak if a surrogate domain grows with the data). The band tables
  * are broadcast-sized by the same bound. Money is held as exact
  * integer cents end to end (one quantization at ingest, the q01
  * cast+round chain); sums are never float.
  */
object Segmentation {

  /** Exact k-quantile band per distinct value of `valueCol` (an
    * integral surrogate): band = (k · cum_lt) div n + 1, ties share.
    * Returns one row per distinct value: (valueCol, band ∈ [1, k]).
    * The cumulative window runs over distinct values only — the
    * caller guarantees that domain is bounded (days, counts, price
    * bands), not row-cardinality. */
  def exactBands(rows: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = rows.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
    val wLt = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = rows.agg(count(lit(1)).as("__n"))
    counts
      .withColumn("__cum_lt", coalesce(sum(col("__c")).over(wLt), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col(valueCol),
        (expr(s"($k * __cum_lt) div __n") + 1).cast("int").as("band"))
  }

  /** RFM scores per customer. Input: one row per order with a
    * customer key, an order timestamp/date, and a 2-decimal price.
    * The anchor for recency is the corpus max order date (a 1-row
    * broadcast), so the result is a pure function of the data.
    * Scores: 5 = best — most recent / most orders / highest spend
    * (recency's ascending band is inverted; frequency and monetary
    * band ascending). Returns (customer, recency_days, frequency,
    * monetary_cents, r_score, f_score, m_score, rfm_cell). */
  def rfm(orders: DataFrame, custCol: String = "o_custkey",
          dateCol: String = "o_orderdate", priceCol: String = "o_totalprice",
          k: Int = 5): DataFrame = {
    // One quantization at ingest: double price → DECIMAL(18,2) →
    // exact integer cents. Every sum downstream is integer-exact.
    val cents = (round(col(priceCol).cast("decimal(28,10)"), 2)
      .cast("decimal(18,2)") * 100).cast("long")
    val per = orders
      .select(col(custCol).as("customer"),
        to_date(col(dateCol)).as("__d"), cents.as("__cents"))
      .groupBy(col("customer"))
      .agg(max(col("__d")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col("__cents")).as("monetary_cents"))
    val anchor = per.agg(max(col("__last")).as("__anchor"))
    val base = per.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      // hundred-dollar band: the monetary surrogate whose distinct
      // domain is bounded by the price range, not the customer count
      .withColumn("__mband", expr("monetary_cents div 10000"))
    val rb = exactBands(base.select("recency_days"), "recency_days", k)
      .withColumnRenamed("band", "__rb")
    val fb = exactBands(base.select("frequency"), "frequency", k)
      .withColumnRenamed("band", "__fb")
    val mb = exactBands(base.select("__mband"), "__mband", k)
      .withColumnRenamed("band", "__mb")
    base
      .join(broadcast(rb), "recency_days")
      .join(broadcast(fb), "frequency")
      .join(broadcast(mb), "__mband")
      .select(col("customer"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        (lit(k + 1) - col("__rb")).cast("int").as("r_score"),
        col("__fb").as("f_score"),
        col("__mb").as("m_score"),
        ((lit(k + 1) - col("__rb")) * 100 + col("__fb") * 10 + col("__mb"))
          .cast("int").as("rfm_cell"))
  }

  /** Exact decision-stump split scan (CART's root step, Breiman et
    * al. 1984) — for one integer feature and a binary label, EVERY
    * candidate threshold's weighted Gini cost, exactly: the
    * interpretable "where does the signal split" read a labeled
    * dataset (e.g. [[graft.events.EventAnalytics.churnLabels]]) owes
    * before anyone trains a forest on it. Split at v: left = rows
    * with feature ≤ v. Weighted Gini n_L·G_L + n_R·G_R = n −
    * S_L/n_L − S_R/n_R with S = pos² + neg² — so the scan emits the
    * EXACT pieces and the cost in milli-units (per-side truncating
    * div, stated; exact while n ≤ 3·10⁷ per int64 — the pieces stay
    * valid far beyond, the modularity device). `is_best` marks the
    * struct-min (cost, threshold) — deterministic tiebreak.
    *
    * Shape: one per-value aggregate (bounded by the feature's
    * distinct values), [[Distributed.prefixSums]] for the cumulative
    * class counts (never a single-partition window over values), one
    * 1-row totals broadcast; the all-left split (n_R = 0) is not a
    * split and is excluded. */
  def stumpSplit(rows: DataFrame, featureCol: String,
                 labelCol: String): DataFrame = {
    val base = rows.select(col(featureCol).cast("long").as("__v"),
      col(labelCol).cast("boolean").cast("long").as("__y"))
    val perV = base.groupBy(col("__v"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__y")).as("__pos"))
    val cum = Distributed.prefixSums(perV, "__v", Seq("__cnt", "__pos"))
    val tot = perV.agg(sum(col("__cnt")).as("__n"), sum(col("__pos")).as("__p"))
    val scan = cum.crossJoin(broadcast(tot))
      .filter(col("__cnt_cum") < col("__n"))
      .select(col("__v").as("threshold"),
        col("__cnt_cum").as("n_left"), col("__pos_cum").as("pos_left"),
        (col("__n") - col("__cnt_cum")).as("n_right"),
        (col("__p") - col("__pos_cum")).as("pos_right"),
        col("__n").as("__nn"))
      .withColumn("cost_milli", expr(
        """__nn * 1000
           - ((pos_left * pos_left
               + (n_left - pos_left) * (n_left - pos_left)) * 1000)
             div n_left
           - ((pos_right * pos_right
               + (n_right - pos_right) * (n_right - pos_right)) * 1000)
             div n_right"""))
      .drop("__nn")
    val best = scan.agg(
      min(struct(col("cost_milli"), col("threshold"))).as("__b"))
    scan.crossJoin(broadcast(best))
      .withColumn("is_best",
        col("cost_milli") === col("__b.cost_milli") &&
          col("threshold") === col("__b.threshold"))
      .drop("__b")
  }
}
