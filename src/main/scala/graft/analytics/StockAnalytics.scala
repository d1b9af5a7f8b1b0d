package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytic query surface
  * (reference `plugins/helpers/queries.py:22-163`) as five DataFrame
  * transformations over the canonical bar table (SURVEY.md §2.5 A3–A6,
  * §2.6 W1/W2, §2.4 J2). Each is a pure plan — partition pruning,
  * pushdown and whole-stage codegen come from Catalyst.
  *
  * `pick` parameterizes the representative-value aggregate: the SQL
  * reference uses ANY_VALUE (nondeterministic); oracle-checked runs
  * pass `min` to stay deterministic.
  */
object StockAnalytics {

  /** Daily metrics view (A3/K9, reference `queries.py:22-34`):
    * per (date, symbol): representative close, avg volatility,
    * source count. */
  def dailyMetrics(bars: DataFrame, pick: Column => Column = any_value(_),
      avgF: Column => Column = avg(_)): DataFrame =
    bars.groupBy(col("date"), col("symbol"))
      .agg(
        pick(col("close")).as("close_price"),
        avgF(col("daily_volatility")).as("avg_volatility"),
        countDistinct(col("data_source")).as("source_count"))

  /** Moving averages, SQL frame semantics (W2, reference
    * `queries.py:76-115`): pre-aggregate multi-source rows to one bar
    * per (symbol, date), then 5/10/20/50-row trailing averages.
    * The pre-agg CTE is semantic, not a perf trick: without it the MA
    * windows would mix rows from both sources.
    * One shuffle for the group-by; the window reuses the same
    * (symbol) partitioning — Catalyst elides the second exchange.
    */
  def movingAverages(bars: DataFrame, pick: Column => Column = any_value(_),
      windows: Seq[Int] = Seq(5, 10, 20, 50)): DataFrame = {
    val daily = bars.groupBy(col("symbol"), col("date"))
      .agg(pick(col("close")).as("close_price"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    windows.foldLeft(daily) { (df, n) =>
      df.withColumn(s"ma_${n}d",
        avg(col("close_price")).over(w.rowsBetween(-(n - 1), Window.currentRow)))
    }
  }

  /** Moving averages, pandas semantics (W1, reference
    * `transformers.py:128-151`): NULL until a full window of rows
    * exists (`rolling(n)` with default min_periods=n). */
  def movingAveragesPandasStyle(bars: DataFrame, pick: Column => Column = any_value(_),
      windows: Seq[Int] = Seq(5, 10, 20, 50)): DataFrame = {
    val daily = bars.groupBy(col("symbol"), col("date"))
      .agg(pick(col("close")).as("close_price"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    windows.foldLeft(daily) { (df, n) =>
      df.withColumn(s"ma_${n}d",
        when(row_number().over(w) >= n,
          avg(col("close_price")).over(w.rowsBetween(-(n - 1), Window.currentRow))))
    }
  }

  /** Cross-source inconsistency report (A4/J2, reference
    * `queries.py:37-73`): per (date, symbol) with >1 source, price
    * stats + divergence pct + per-source detail array, HAVING expressed
    * as a post-agg filter. The detail array is sorted for determinism
    * (the SQL's ARRAY_AGG has no ORDER BY — ours is strictly more
    * defined). */
  def inconsistencies(bars: DataFrame, minPctDiff: Double = 2.0): DataFrame =
    bars.groupBy(col("date"), col("symbol"))
      .agg(
        min(col("close")).as("min_close"),
        max(col("close")).as("max_close"),
        avg(col("close")).as("avg_close"),
        countDistinct(col("data_source")).as("source_count"),
        array_sort(collect_list(struct(col("data_source"), col("close"))))
          .as("source_details"))
      .filter(col("source_count") > 1)
      .withColumn("price_diff_pct",
        (col("max_close") - col("min_close")) / col("min_close") * 100)
      .filter(col("price_diff_pct") > minPctDiff)

  /** Data-quality metrics (A5, reference `queries.py:118-147`): one
    * global aggregation row — counts, distinct counts, null counts
    * (COUNTIF ≡ count(when)), price stats, plus an ordered per-source
    * count array (the ARRAY_AGG(STRUCT(...) ORDER BY) two-step). */
  def qualityMetrics(bars: DataFrame): DataFrame = {
    val perSource = bars.groupBy(col("data_source")).agg(count(lit(1)).as("cnt"))
    val sourceArray = perSource
      .agg(array_sort(collect_list(struct(col("data_source"), col("cnt"))))
        .as("source_counts"))
    val global = bars.agg(
      count(lit(1)).as("total_rows"),
      countDistinct(col("date")).as("unique_dates"),
      countDistinct(col("symbol")).as("unique_symbols"),
      countDistinct(col("data_source")).as("unique_sources"),
      min(col("date")).as("earliest_date"),
      max(col("date")).as("latest_date"),
      count(when(col("open").isNull, 1)).as("null_open"),
      count(when(col("high").isNull, 1)).as("null_high"),
      count(when(col("low").isNull, 1)).as("null_low"),
      count(when(col("volume").isNull, 1)).as("null_volume"),
      min(col("close")).as("min_close"),
      max(col("close")).as("max_close"),
      avg(col("close")).as("avg_close"))
    global.crossJoin(sourceArray)
  }

  /** Incremental maintenance of the daily-metrics rollup (A3) under a
    * bar-table increment — the materialized-view-refresh pattern that
    * makes the reference's `stock_daily_metrics` view affordable at
    * 100 TB: instead of re-aggregating the whole history on every
    * load, recompute ONLY the dates the staging batch touches (a
    * partition-pruned scan of the updated base) and splice them into
    * the stored rollup (anti-join out the stale groups, union the
    * fresh ones). Invariant — proven end-to-end by the oracle row:
    * incremental result ≡ [[dailyMetrics]] recomputed from scratch.
    * Touched-date granularity aligns with the table's date
    * partitioning, so the recompute scan reads a day's worth of files
    * per staged day. */
  def incrementalDailyMetrics(rollup: DataFrame, updatedBars: DataFrame,
      staging: DataFrame, pick: Column => Column = any_value(_),
      avgF: Column => Column = avg(_)): DataFrame = {
    val touched = staging.select(col("date")).distinct()
    val recomputed = dailyMetrics(
      updatedBars.join(broadcast(touched), Seq("date"), "left_semi"),
      pick, avgF)
    rollup.join(broadcast(touched), Seq("date"), "left_anti")
      .unionByName(recomputed)
  }

  /** A5 at 100 TB: `countDistinct` expands to a two-phase plan that
    * shuffles every distinct value; the HLL sketch shuffles a fixed
    * ~KB register set per group instead. Bounded error (`rsd`),
    * unbounded scale — the swap-in when the exact form's shuffle
    * becomes the bottleneck. Not oracle-checked (approximate by
    * design); the suite bounds its error against the exact form. */
  def qualityMetricsApprox(bars: DataFrame, rsd: Double = 0.02): DataFrame =
    bars.agg(
      count(lit(1)).as("total_rows"),
      approx_count_distinct(col("date"), rsd).as("unique_dates"),
      approx_count_distinct(col("symbol"), rsd).as("unique_symbols"),
      approx_count_distinct(col("data_source"), rsd).as("unique_sources"),
      min(col("date")).as("earliest_date"),
      max(col("date")).as("latest_date"),
      min(col("close")).as("min_close"),
      max(col("close")).as("max_close"))

  /** Ingestion stats (A6, reference `queries.py:150-163`): per
    * ingestion day (DATE(processed_at)): volumes, distinct symbols and
    * sources, covered bar-date range. */
  def ingestionStats(bars: DataFrame): DataFrame =
    bars.groupBy(to_date(col("processed_at")).as("ingestion_date"))
      .agg(
        count(lit(1)).as("rows_ingested"),
        countDistinct(col("symbol")).as("unique_symbols"),
        countDistinct(col("data_source")).as("unique_sources"),
        min(col("date")).as("earliest_data_date"),
        max(col("date")).as("latest_data_date"))

  /** OHLC resampling: daily bars → weekly bars (open = first present
    * day's open, close = last present day's close, high/low/volume
    * aggregated). Input must be ONE row per (symbol, date) — run the
    * per-day pre-aggregation first (multi-source days would make
    * "first open" ill-defined).
    *
    * first/last are expressed as min/max(date) + a self-join back to
    * the daily row, NOT min_by/arg_min: the engines disagree on NULL
    * handling in arg-extremes (DuckDB's arg_min skips NULL values,
    * Spark's min_by returns them), and a NULL open on the week's first
    * day must stay NULL. The joins are on (symbol, exact date) — tiny
    * keyed shuffles against the already-aggregated weekly frame. */
  def resampleWeekly(daily: DataFrame): DataFrame = {
    val week = date_trunc("week", col("date")).cast("date").as("week")
    val agg = daily.groupBy(col("symbol"), week)
      .agg(min(col("date")).as("__d0"), max(col("date")).as("__d1"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        sum(col("volume")).as("volume"), count(lit(1)).as("n_days"))
    val opens = daily.select(col("symbol").as("__s0"), col("date").as("__d0"),
      col("open").as("open"))
    val closes = daily.select(col("symbol").as("__s1"), col("date").as("__d1"),
      col("close").as("close"))
    agg.join(opens, col("symbol") === col("__s0") && agg("__d0") === opens("__d0"))
      .join(closes, col("symbol") === col("__s1") && agg("__d1") === closes("__d1"))
      .select(col("symbol"), col("week"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("n_days"))
  }

  /** Calendar gap-fill with forward-fill (LOCF — last observation
    * carried forward), the resampling dual of [[resampleWeekly]]: a
    * daily series with holes (market holidays, missed scrapes)
    * becomes a DENSE calendar per symbol — every day between the
    * symbol's first and last observation — with missing days taking
    * the latest prior value and flagged `is_filled` (the flag is the
    * honesty bit: downstream must be able to weight real vs carried
    * observations). The first spine day is an observation by
    * construction, so no leading NULL survives.
    *
    * Shape: one tiny per-symbol bounds aggregate exploded into the
    * date spine (`sequence(d0, d1, 1 day)` — codegen'd, rows =
    * symbols × span), one left join back on (symbol, date), one
    * per-symbol ordered window for `last(value, ignoreNulls)`.
    * The oracle twin deliberately derives the same answer by a
    * STRUCTURALLY different route (DuckDB ASOF JOIN) — a real
    * cross-check on the fill semantics, not an echo. */
  def fillDailyForward(daily: DataFrame, symbolCol: String = "symbol",
                       dateCol: String = "date",
                       valueCol: String = "close"): DataFrame = {
    val spine = daily.groupBy(col(symbolCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(symbolCol),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as(dateCol))
    val w = Window.partitionBy(col(symbolCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily.select(col(symbolCol), col(dateCol), col(valueCol)),
        Seq(symbolCol, dateCol), "left")
      .withColumn("is_filled", col(valueCol).isNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Linear-interpolation gap fill — the level-tracking complement to
    * [[fillDailyForward]]'s step fill: a missing day between two
    * observations takes the straight-line value between them instead
    * of repeating the left edge (the pandas `interpolate('linear')`
    * contract, as [[fillDailyForward]] is `ffill`). Operates on an
    * INTEGER value column (cents / integral price units) so the
    * interpolated point is exact floor arithmetic — engines cannot
    * disagree on a double near a half — via the floor-division
    * identity `(n − pmod(n, d)) div d` (Spark `div` truncates toward
    * zero, so raw `div` on a negative numerator — a falling price —
    * would round the wrong way; pmod ≥ 0 restores floor semantics,
    * matching DuckDB's floor `//`).
    *
    * Every spine day strictly between two observations has both
    * brackets (the spine is bounded by each symbol's min/max observed
    * date), so no edge NULLs arise. Shape: the [[fillDailyForward]]
    * spine + ONE ordered window pass per direction. The forward
    * ("next observation") pass is deliberately NOT
    * `first(...) OVER (... ROWS BETWEEN CURRENT ROW AND UNBOUNDED
    * FOLLOWING)`: Spark's shrinking-frame processor
    * (UnboundedFollowingWindowFunctionFrame) re-aggregates the
    * remaining rows for EVERY row — O(n²) per partition (measured:
    * 11.9 s vs 1.3 s for the same spine at sf0.1). The same value is
    * the running `last(...)` under the REVERSED sort, which uses the
    * incremental growing frame — O(n) — at the cost of one extra
    * per-partition sort. Both passes stay on the symbol-keyed
    * shuffle. */
  def fillDailyInterpolate(daily: DataFrame, symbolCol: String = "symbol",
                           dateCol: String = "date",
                           valueCol: String = "close_i"): DataFrame = {
    val spine = daily.groupBy(col(symbolCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(symbolCol),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as(dateCol))
    val wP = Window.partitionBy(col(symbolCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward pass: running last under the reversed order — the O(n)
    // growing frame — NOT first() over a shrinking frame (O(n²))
    val wN = Window.partitionBy(col(symbolCol)).orderBy(col(dateCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val numer = s"(__nv - __pv) * datediff($dateCol, __pd)"
    val denom = s"datediff(__nd, __pd)"
    spine
      .join(daily.select(col(symbolCol), col(dateCol), col(valueCol)),
        Seq(symbolCol, dateCol), "left")
      .withColumn("is_interp", col(valueCol).isNull)
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(wP))
      .withColumn("__pd", last(when(col(valueCol).isNotNull, col(dateCol)),
        ignoreNulls = true).over(wP))
      .withColumn("__nv", last(col(valueCol), ignoreNulls = true).over(wN))
      .withColumn("__nd", last(when(col(valueCol).isNotNull, col(dateCol)),
        ignoreNulls = true).over(wN))
      .withColumn(valueCol,
        when(!col("is_interp"), col(valueCol))
          .otherwise(expr(
            s"__pv + ($numer - pmod($numer, $denom)) div $denom")))
      .select(col(symbolCol), col(dateCol), col(valueCol), col("is_interp"))
  }

  /** Trading-gap report — the data-completeness complement of
    * [[fillDailyForward]]: where the fill PATCHES holes, this one
    * REPORTS them (the ingest-monitoring view: "which symbols have
    * missing days, how many, and how bad was the worst outage").
    * Per symbol: observation count, span days, gap count (runs of ≥1
    * missing calendar day between consecutive observations), total
    * missing days, and the longest run — all exact integer date
    * arithmetic. Zero-gap symbols report zeros (left semantics via
    * conditional aggregates, not a join).
    *
    * Shape: ONE symbol-keyed lag window + one per-symbol aggregate.
    * Weekend/holiday caveat stated: against a trading calendar,
    * join a calendar table first — this reports CALENDAR gaps. */
  def tradingGaps(daily: DataFrame, symbolCol: String = "symbol",
                  dateCol: String = "date"): DataFrame = {
    val w = Window.partitionBy(col(symbolCol)).orderBy(col(dateCol))
    daily.select(col(symbolCol), col(dateCol))
      .withColumn("__gap",
        datediff(col(dateCol), lag(col(dateCol), 1).over(w)) - 1)
      .groupBy(col(symbolCol))
      .agg(count(lit(1)).as("n_days"),
        (datediff(max(col(dateCol)), min(col(dateCol))) + 1).cast("long")
          .as("span_days"),
        sum(when(col("__gap") > 0, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(sum(when(col("__gap") > 0, col("__gap"))), lit(0L))
          .cast("long").as("missing_days"),
        coalesce(max(when(col("__gap") > 0, col("__gap"))), lit(0L))
          .cast("long").as("longest_gap_days"))
  }

  /** Customer-cohort LTV curve — the revenue-expansion table next to
    * activity retention (q55): per first-order-MONTH cohort and
    * month offset, active customers, exact period revenue in integer
    * cents (the q159 one-quantization chain), and the cumulative
    * lifetime value the curve plots. Month arithmetic is exact
    * integer year×12+month differences — no interval/float dates.
    *
    * Shape: one per-customer min aggregate, one customer-keyed join,
    * one (cohort, offset) aggregate, and a cumulative window over
    * OFFSETS within a cohort (bounded by the corpus month span). */
  def ltvCurve(orders: DataFrame, custCol: String = "o_custkey",
               dateCol: String = "o_orderdate",
               priceCol: String = "o_totalprice"): DataFrame = {
    val cents = (round(col(priceCol).cast("decimal(28,10)"), 2)
      .cast("decimal(18,2)") * 100).cast("long")
    def monthIdx(c: Column) = year(c) * 12 + (month(c) - 1)
    val o = orders.select(col(custCol).as("customer"),
      to_date(col(dateCol)).as("__d"), cents.as("__cents"))
    val first = o.groupBy(col("customer"))
      .agg(min(col("__d")).as("__f"))
      .select(col("customer"), monthIdx(col("__f")).as("__m0"),
        date_format(col("__f"), "yyyy-MM").as("cohort_month"))
    val w = Window.partitionBy(col("cohort_month")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.join(first, "customer")
      .withColumn("month_offset",
        (monthIdx(col("__d")) - col("__m0")).cast("int"))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(countDistinct(col("customer")).as("n_active"),
        sum(col("__cents")).as("revenue_cents"))
      .withColumn("cum_revenue_cents",
        sum(col("revenue_cents")).over(w))
  }

  /** Time-window filter helper (P15, reference `queries.py:46,83-84`):
    * `date >= anchor - n days`, optional symbol IN list. `anchor`
    * defaults to current_date; oracle runs pass a literal. */
  def recentWindow(bars: DataFrame, days: Int,
      anchor: Column = current_date(),
      symbols: Seq[String] = Nil): DataFrame = {
    val base = bars.filter(col("date") >= date_sub(anchor, days))
    if (symbols.isEmpty) base else base.filter(col("symbol").isin(symbols: _*))
  }

  /** Classical additive seasonal decomposition (the pre-STL textbook
    * method: e.g. Hyndman & Athanasopoulos, *Forecasting* §3.4) —
    * close = trend + seasonal + residual, the time-series shelf's
    * missing DECOMPOSITION next to the smoothers (E-EMA/Holt) and
    * level/trend tests (Pettitt/Mann–Kendall): trend = centered
    * `period`-row moving average (FULL windows only — NULL at each
    * series' edges, the statsmodels convention), seasonal = per
    * (symbol, weekday-slot) mean of the detrended series CENTERED so
    * the period's indices sum to ≈0, residual = the rest.
    *
    * Exactness contract: `close` is the q01-exact integer-valued bar
    * double, so EVERYTHING here is exact BIGINT in floor-quantized
    * MICRO-units (the bm25 device): trend_micro = 1e6·Σ₇ div 7,
    * detrended = 1e6·close − trend_micro, seasonal = group-sum div
    * count then centered by the per-symbol index mean — deterministic
    * under any partitioning and bit-identical cross-engine (both
    * engines' integer division truncates toward zero — measured).
    * The seasonal slot is pmod(days since 1970-01-05 (a Monday),
    * period) — engine-neutral where dayofweek()'s origin is not, and
    * it follows `period` (at the default 7 it is exactly the weekday,
    * 0=Mon), so the seasonal grouping always matches the MA window.
    *
    * Input: one bar per (symbol, date) — the q174 caller-dedup
    * contract. Shape: one symbol-partitioned window pass + one
    * (symbol, slot) aggregate (period-bounded) + one broadcast-sized
    * join back; rows never widen. */
  def seasonalDecompose(daily: DataFrame, period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd >= 3 (centered MA), got $period")
    val half = period / 2
    val frame = Window.partitionBy(col("symbol")).orderBy(col("date"))
      .rowsBetween(-half, half)
    val base = daily.select(col("symbol"), col("date"),
      col("close").cast("long").as("close_units"),
      // slot follows `period` (days-since-anchor mod period), so a
      // non-weekly period groups by its own cycle instead of silently
      // mixing a period-length trend window with weekday-7 indices;
      // for the default 7 this is exactly the weekday slot (0 = Mon)
      pmod(datediff(col("date"), lit("1970-01-05")), lit(period)).as("slot"))
    val t = base
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__s", sum(col("close_units")).over(frame))
      .withColumn("trend_micro",
        expr(s"CASE WHEN __n = $period THEN (__s * 1000000) div $period END"))
      .withColumn("detrended_micro",
        col("close_units") * 1000000L - col("trend_micro"))
      .drop("__n", "__s")
    val idx = t.filter(col("detrended_micro").isNotNull)
      .groupBy(col("symbol"), col("slot"))
      .agg(sum(col("detrended_micro")).as("__ds"),
        count(lit(1)).as("__dc"))
      .withColumn("__raw", expr("__ds div __dc"))
    val adj = idx.groupBy(col("symbol"))
      .agg(sum(col("__raw")).as("__rs"), count(lit(1)).as("__rc"))
      .withColumn("__adj", expr("__rs div __rc"))
      .select(col("symbol"), col("__adj"))
    val seasonal = idx.join(adj, "symbol")
      .select(col("symbol"), col("slot"),
        (col("__raw") - col("__adj")).as("seasonal_micro"))
    t.join(seasonal, Seq("symbol", "slot"), "left")
      .select(col("symbol"), col("date"), col("close_units"),
        col("trend_micro"), col("seasonal_micro"),
        (col("detrended_micro") - col("seasonal_micro")).as("residual_micro"))
  }

  /** Seasonality / trend STRENGTH from the classical decomposition
    * (Wang, Smith & Hyndman, J. Comp. Graph. Stat. 2006; the fpp3
    * §4.3 feature pair): F_seasonal = max(0, 1 − Var(R)/Var(S+R)),
    * F_trend = max(0, 1 − Var(R)/Var(T+R)) — both in [0, 1], the
    * series-triage numbers that tell a forecasting pipeline WHICH
    * model family each series needs (strong seasonality →
    * [[graft.analytics.Indicators.holtWinters]], strong trend →
    * Holt, neither → the mean) before any fitting runs.
    *
    * Composes [[seasonalDecompose]]'s exact micro-unit components
    * over the interior rows (trend defined): each variance is
    * computed from EXACT BIGINT sums (Σx, Σx² in DECIMAL(38,0) —
    * micro-unit squares overflow int64, stated) via the
    * n·Σx² − (Σx)² identity, and the two strengths are the ONE
    * double computed from those exact integers by an identical
    * operation tree in both engines (the q62 device). Per-symbol
    * output, one aggregate over the decomposition. */
  def decompositionStrength(daily: DataFrame, period: Int = 7): DataFrame = {
    val d = seasonalDecompose(daily, period)
      .filter(col("residual_micro").isNotNull)
      .select(col("symbol"),
        col("residual_micro").cast("decimal(38,0)").as("r"),
        (col("seasonal_micro") + col("residual_micro"))
          .cast("decimal(38,0)").as("sr"),
        (col("trend_micro") + col("residual_micro"))
          .cast("decimal(38,0)").as("tr"))
    d.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("r")).as("__sr1"), sum(col("r") * col("r")).as("__sr2"),
        sum(col("sr")).as("__ss1"), sum(col("sr") * col("sr")).as("__ss2"),
        sum(col("tr")).as("__st1"), sum(col("tr") * col("tr")).as("__st2"))
      .select(col("symbol"), col("n_rows"),
        expr("""greatest(CAST(0 AS DOUBLE), 1.0 -
          (CAST(n_rows * __sr2 - __sr1 * __sr1 AS DOUBLE) /
           CAST(n_rows * __ss2 - __ss1 * __ss1 AS DOUBLE)))""")
          .as("seasonal_strength"),
        expr("""greatest(CAST(0 AS DOUBLE), 1.0 -
          (CAST(n_rows * __sr2 - __sr1 * __sr1 AS DOUBLE) /
           CAST(n_rows * __st2 - __st1 * __st1 AS DOUBLE)))""")
          .as("trend_strength"))
  }
}
