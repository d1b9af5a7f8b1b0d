package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic distribution profiling — the "what does this column look
  * like" pass a pipeline runs before choosing thresholds (quality
  * cut-offs, bin boundaries, partition sizing). One hash aggregation;
  * at any scale the output is bounded by the bin count, never the row
  * count. */
object Profiling {

  /** Approximate percentiles — the 100 TB swap-in for the exact
    * `percentile_cont` path (q38): the exact form shuffles every value
    * to a per-group sort, the KLL/GK-style sketch behind
    * `percentile_approx` shuffles a bounded-size summary per
    * partition. `accuracy` trades sketch size for rank error
    * (guaranteed ≤ 1/accuracy of the rank); not oracle-checked
    * (approximate by design) — the suite bounds its error against the
    * exact percentiles on harness data. */
  def approxPercentiles(df: DataFrame, valueCol: String, groupCol: String,
                        percentiles: Seq[Double] = Seq(0.5, 0.9, 0.95),
                        accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
      "percentiles must be in [0,1]")
    val pArr = array(percentiles.map(lit): _*)
    val approx = percentile_approx(col(valueCol), pArr, lit(accuracy))
    percentiles.zipWithIndex.foldLeft(
      df.groupBy(col(groupCol)).agg(approx.as("__ps"))) {
      case (acc, (p, i)) =>
        acc.withColumn(s"p${(p * 100).toInt}", col("__ps")(i))
    }.drop("__ps")
  }

  /** Equal-frequency quantile features — the two rank transforms a
    * feature pipeline derives together: `bucket` = the row's
    * k-quantile bin (`ntile(k)`, SQL-standard floor/ceil sizing — the
    * first `n mod k` buckets carry one extra row) and `rank_permille`
    * = the value's exact normalized rank in `[0, 1000]` (quantile
    * normalization; TIED values share a rank — equal inputs must map
    * to equal features — while ntile's total order carries `tieCol`
    * so bucket assignment stays deterministic under any partitioning;
    * a single-row group normalizes to 0).
    *
    * Shape: one exchange on the group, two window passes over the
    * same partitioning (the ntile order is (value, tie); the rank
    * order (value) is its prefix — no second exchange, one cheap
    * re-sort), integer `div` arithmetic end to end. Window frames run
    * per GROUP — use a config-sized grouping (symbol, lang); a global
    * rank at corpus scale belongs to approxPercentiles above. */
  def quantileFeatures(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int, tieCol: String): DataFrame = {
    require(k > 0, "k must be positive")
    val byGroup = Window.partitionBy(col(groupCol))
    val total = byGroup.orderBy(col(valueCol), col(tieCol))
    val valueOnly = byGroup.orderBy(col(valueCol))
    df.withColumn("bucket", ntile(k).over(total))
      .withColumn("__rk", rank().over(valueOnly))
      .withColumn("__n", count(lit(1)).over(byGroup))
      .withColumn("rank_permille",
        when(col("__n") === 1, lit(0L))
          .otherwise(expr("((__rk - 1) * 1000) div (__n - 1)")))
      .drop("__rk", "__n")
  }

  /** GLOBAL approximate-quantile bucket transform — the corpus-scale
    * complement to [[quantileFeatures]]'s per-group exact ranks: that
    * operator's ntile/rank windows run per GROUP and would need a
    * single-partition global sort for a corpus-wide transform (the
    * exact thing that cannot exist at 100 TB); this one computes the
    * k−1 global cutpoints with `percentile_approx`'s bounded
    * KLL/GK-style sketch (one partial-agg pass, per-partition state
    * bounded by `accuracy`, never the data) and assigns each row its
    * bucket by comparing against the broadcast cutpoints — a second
    * scan-side pass with zero shuffles of the data itself.
    *
    * Bucket semantics: bucket(v) = 1 + |{cutpoints c : v > c}| —
    * ties land LOW (a value equal to a cutpoint joins the lower
    * bucket), and equal values always share a bucket (the
    * quantile-normalization invariant [[quantileFeatures]] pins for
    * rank_permille; global ntile cannot guarantee it, a documented
    * semantic difference, not a defect). The comparisons unroll to k−1
    * codegen'd scalar `when`s (no higher-order-function lambda on the
    * hot path — interpreted per row); k is config-sized.
    *
    * Error contract (why there is no DuckDB oracle — the E23/
    * tableStatsApprox precedent): the sketch guarantees each cutpoint
    * sits within rank error n/accuracy of the exact quantile, so a
    * row's bucket can differ from the exact-sort bucket only if its
    * rank lies within n/accuracy of a boundary — the suite asserts
    * exactly that bound against an exact ntile on harness data, plus
    * the no-global-sort plan shape. NULL values pass through with
    * bucket NULL (they have no rank). */
  def globalQuantileBuckets(df: DataFrame, valueCol: String, k: Int,
                            accuracy: Int = 10000): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(accuracy >= k, "accuracy below k makes every bucket boundary noise")
    val probs = (1 until k).map(i => i.toDouble / k)
    val cuts = df.filter(col(valueCol).isNotNull)
      .agg(percentile_approx(col(valueCol), array(probs.map(lit): _*),
        lit(accuracy)).as("__cuts"))
    val bucket = (0 until k - 1).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(valueCol) > col("__cuts").getItem(i), 1L).otherwise(0L)
    }
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col(valueCol).isNull, lit(null).cast("long")).otherwise(bucket))
      .drop("__cuts")
  }

  /** EXACT global quantiles WITHOUT a global row sort — the exact
    * complement to [[globalQuantileBuckets]]' sketch (which trades
    * rank error n/accuracy for one pass) and the global complement to
    * [[quantileFeatures]]' per-group exact ranks: when the cutpoint
    * must be a fact (billing tiers, SLO thresholds, contractual
    * percentiles), "within rank error" isn't a spec. Type-1
    * (discrete) semantics: the q-quantile is the smallest value whose
    * inclusive cumulative count reaches ceil(q·n/1000) — an observed
    * value, never an interpolation (exact-integer discipline).
    *
    * Shape: one hash aggregate to DISTINCT values (the sorted frame
    * is distinct values, not rows), [[Distributed.prefixSums]] for
    * the global cumulative counts, then a config-sized explode
    * (values × |q|) collapsed by a map-side-combined min per level.
    * Nothing is collected; no unpartitioned window anywhere.
    * Returns (q_permille, value, target_rank, n); empty input →
    * empty output (a quantile of nothing is not a row). */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      "quantile levels must be permille in [1, 1000]")
    val g = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__n"))
    val cum = Distributed.prefixSums(g, "__v", Seq("__n"))
    val tot = cum.agg(sum(col("__n")).as("__tot"))
    cum.crossJoin(broadcast(tot))
      .select(col("__v"), col("__n_cum"), col("__tot"),
        explode(array(qPermille.distinct.sorted.map(lit): _*))
          .as("q_permille"))
      .withColumn("__target", expr("(q_permille * __tot + 999) div 1000"))
      .filter(col("__n_cum") >= col("__target"))
      .groupBy(col("q_permille"))
      .agg(min(col("__v")).as("value"),
        max(col("__target")).as("target_rank"),
        max(col("__tot")).as("n"))
  }

  /** Fixed-width histogram of a numeric column: per bin — row count,
    * observed min/max. Bin i covers [minVal + i·width, minVal +
    * (i+1)·width); values below `minVal` land in negative bins (the
    * caller sees them rather than losing them). Empty bins are absent
    * (sparse output — at scale a dense range could be huge). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double,
                minVal: Double = 0.0): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull)
      .groupBy(floor((v - minVal) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(v).as("bin_min"),
        max(v).as("bin_max"))
      .withColumn("bin_lo", lit(minVal) + col("bin") * binWidth)
  }

  /** Winsorized per-group stats — the outlier-clipping pass a feature
    * pipeline runs before normalization: values are clamped to the
    * group's [loP, hiP] exact percentiles and the report carries the
    * clip counts plus exact-decimal sums before/after.
    *
    * The percentile bounds ride the frequency-weighted exact
    * percentile (the q38 path): a codegen'd (group, value, freq)
    * pre-aggregate shrinks the percentile buffer to the value DOMAIN —
    * the right exact form when the measure is low-cardinality
    * (quantities, ratings, bucketized sizes). The bounds frame is one
    * row per group; it is broadcast back onto the rows, so the data
    * path pays one scan + one final group aggregate. Requires a
    * bounded group universe (true of every config-sized dimension);
    * drop the broadcast hint for high-cardinality groups. */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      loP: Double = 0.05, hiP: Double = 0.95,
                      sumScale: Int = 4): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP < hiP, "need 0 <= loP < hiP <= 1")
    val v = col(valueCol)
    val bounds = df.groupBy(col(groupCol), v)
      .agg(count(lit(1)).as("__freq"))
      .groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $loP, __freq)").as("__lo"),
        expr(s"percentile($valueCol, $hiP, __freq)").as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(v < col("__lo"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(v > col("__hi"), 1L).otherwise(0L)).as("n_clipped_high"),
        graft.core.Exact.exactSum(v, sumScale).as("sum_raw"),
        graft.core.Exact.exactSum(
          least(greatest(v.cast("double"), col("__lo")), col("__hi")), sumScale)
          .as("sum_winsor"),
        min(col("__lo")).as("lo"),
        min(col("__hi")).as("hi"))
  }

  /** Robust per-row scaling transform — (v − median) / IQR per group,
    * the outlier-resistant normalization feature pipelines prefer
    * over z-scores on raw feeds (one corrupted ingest day shifts a
    * mean/stddev scale and masks itself; the median/IQR scale barely
    * moves — the [[madOutliers]] argument, as a TRANSFORM instead of
    * an audit). Returns every input row with its group median, IQR,
    * and scaled value; a zero-IQR group (over half the mass on one
    * value) yields NULL scaled — stated, never a division blow-up.
    *
    * Shape: the q77 frequency-weighted exact-percentile pre-aggregate
    * (buffer ∝ value DOMAIN, not rows) produces a one-row-per-group
    * bounds frame, broadcast back onto the rows — one scan + one
    * config-sized-group aggregate, no window over the data. Exact
    * percentile (the q38 DuckDB-parity path) keeps it
    * oracle-checkable; at 100 TB with high-cardinality value domains
    * swap the bounds for [[approxPercentiles]]' sketch — same plan
    * shape, same join. */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val bounds = df.groupBy(col(groupCol), v)
      .agg(count(lit(1)).as("__freq"))
      .groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array(0.25, 0.5, 0.75), __freq)")
        .as("__ps"))
      .select(col(groupCol), col("__ps")(0).as("__q1"),
        col("__ps")(1).as("med"), col("__ps")(2).as("__q3"))
    df.join(broadcast(bounds), groupCol)
      .select(col(groupCol), v, col("med"),
        (col("__q3") - col("__q1")).as("iqr"),
        when(col("__q3") - col("__q1") > 0,
          (v.cast("double") - col("med")) / (col("__q3") - col("__q1")))
          .as("scaled"))
  }

  /** Robust per-group outlier audit via MAD (median absolute
    * deviation): per group — row count, median, MAD, and how many rows
    * sit more than `k` MADs from the median. The robust twin of
    * z-score outlier detection: one corrupted ingest day shifts a
    * mean/stddev fence (masking itself) but not the median/MAD fence,
    * which is why quality gates on raw feeds use this form.
    *
    * Two exact-percentile passes (median of the values, then median of
    * the absolute deviations — the second is inherently a second pass:
    * deviations don't exist until the median does), each a per-group
    * `percentile` over the shuffled group, plus a broadcast of the
    * one-row-per-group median frame back onto the rows. The input
    * feeds THREE consumers (median, MAD, fence count) and Spark cannot
    * share a subplan across them, so `materialize` (default on)
    * localCheckpoints the input once — every later pass re-reads the
    * checkpoint instead of recomputing the upstream pipeline (for a
    * raw-table input this knob is a no-op cost-wise; for a derived
    * frame it is the difference between one upstream pass and
    * three). Output is bounded by the group
    * universe. At 100 TB swap both percentiles for
    * [[approxPercentiles]]'s sketch (same shape, bounded buffers); the
    * exact form here is what makes the operator oracle-checkable.
    *
    * Determinism: percentile interpolation is bit-identical to
    * DuckDB's quantile_cont (the q38-proven parity); deviations and
    * the k·MAD fence evaluate in identical double trees, so the strict
    * `>` verdicts agree bitwise. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0, materialize: Boolean = true): DataFrame = {
    val base = if (materialize) df.localCheckpoint() else df
    val med = base.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = base.join(broadcast(med), groupCol)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    val stats = dev.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), min(col("med")).as("med"),
        expr("percentile(__dev, 0.5)").as("mad"))
    val outs = dev.join(broadcast(stats.select(col(groupCol), col("mad"))),
        groupCol)
      .filter(col("__dev") > lit(k) * col("mad"))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_outliers"))
    stats.join(outs, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("med"), col("mad"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
  }

  /** Categorical drift between two snapshots of a column (training
    * corpus vs incoming batch, yesterday vs today): per-category share
    * difference |aᵢ/Nₐ − bᵢ/N_b|, computed as the exact integer cross
    * product |aᵢ·N_b − bᵢ·Nₐ| over the common denominator Nₐ·N_b with
    * ONE final double division (the q62/q89 determinism pattern) —
    * summed and halved this is total-variation distance, the ℓ¹ drift
    * measure with none of PSI's per-category logs (which would break
    * the bit-exact oracle and blow up on empty bins). Categories
    * appearing on one side only surface with a zero count, not a
    * dropped row; a NULL category is a category like any other — the
    * outer join is NULL-SAFE (`<=>`), so null-in-base and
    * null-in-incoming meet in ONE row instead of two phantom
    * one-sided rows inflating the drift score. Cost: two count
    * aggregates + a category-sized full-outer join; the totals frame
    * is one row, broadcast back. */
  def categoricalDrift(base: DataFrame, incoming: DataFrame,
                       keyCol: String): DataFrame = {
    def counts(df: DataFrame, k: String, n: String) =
      df.groupBy(col(keyCol).as(k)).agg(count(lit(1)).as(n))
    val j = counts(base, "__ka", "__a")
      .join(counts(incoming, "__kb", "__b"),
        col("__ka") <=> col("__kb"), "full")
      .select(coalesce(col("__ka"), col("__kb")).as(keyCol),
        coalesce(col("__a"), lit(0L)).as("n_base"),
        coalesce(col("__b"), lit(0L)).as("n_in"))
    val tot = j.agg(sum(col("n_base")).as("__na"), sum(col("n_in")).as("__nb"))
    j.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_base"), col("n_in"),
        abs(col("n_base") * col("__nb") - col("n_in") * col("__na"))
          .as("abs_cross"),
        (abs(col("n_base") * col("__nb") - col("n_in") * col("__na"))
          .cast("double") / (col("__na") * col("__nb")).cast("double"))
          .as("share_diff"))
  }

  /** Scalar total-variation distance in [0, 1]: half the summed share
    * differences. 0 = identical distributions, 1 = disjoint support. */
  def driftScore(base: DataFrame, incoming: DataFrame,
                 keyCol: String): Double =
    categoricalDrift(base, incoming, keyCol)
      .agg(sum(col("share_diff"))).collect()(0).getDouble(0) / 2.0

  /** ANALYZE-style table statistics — the per-column profile a
    * cost-based optimizer (and every data-quality dashboard) feeds
    * on: non-null count, null count, exact distinct count, and
    * min/max (computed on the NATIVE type, rendered as strings so one
    * schema fits every column type). One logical scan; the multiple
    * exact count-distincts expand the scan |cols| ways — at 100 TB
    * swap `countDistinct` for `approx_count_distinct` (same plan
    * shape, one pass, ±2%) or run ndv on a hash sample; min/max/counts
    * stay exact either way. Restrict `cols` to types whose string
    * rendering is engine-stable when oracle-checking (integers,
    * strings, dates — not doubles). */
  /** Per-group WEIGHTED lower median — the center of a weighted
    * distribution (docs weighted by quality/epochs, trades by size)
    * where the plain median ([[graft.etl.Impute.imputeMedian]]'s
    * selector) would let a million near-zero-weight rows outvote the
    * mass. Lower weighted median: the value at which running weight
    * first reaches `(W+1) DIV 2` — an observed value, exact integers
    * throughout.
    *
    * Selection is the CROSSING ROW: `cum − w < threshold ≤ cum` —
    * exactly one row per group satisfies it (cum is strictly
    * increasing; weights ≤ 0 are filtered, stated), and under
    * equal-value ties the crossing lands inside the tied block
    * whatever their internal order, so the emitted VALUE is a pure
    * function of the row multiset. One window pass (running +
    * total + count share a partitioning), one filter — no second
    * aggregate, no join. */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                     weightCol: String): DataFrame = {
    val wRun = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    df.filter(col(valueCol).isNotNull && col(weightCol) > 0)
      .withColumn("__cw", sum(col(weightCol)).over(wRun))
      .withColumn("__tw", sum(col(weightCol)).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__th", expr("(__tw + 1) div 2"))
      .filter(col("__cw") >= col("__th") &&
        (col("__cw") - col(weightCol)) < col("__th"))
      .select(keys.map(col) :+ col(valueCol).as("w_median") :+
        col("__tw").as("total_weight") :+ col("__n").as("n_rows"): _*)
  }

  /** Pairwise functional-dependency DISCOVERY over a stated column
    * list — the profiling complement to E183's single-FD violation
    * report: E183 checks the dependency you assert; this finds the
    * ones that hold. A → B holds on the observed data iff every A
    * value maps to one B value, i.e. `countDistinct(A, B) ==
    * countDistinct(A)` — counted, not sampled, so the verdict is a
    * fact about the table (on THIS data; discovery never proves a
    * constraint, it proposes one — stated). Rows with a NULL in
    * either column are excluded from that pair's counts (SQL distinct
    * tuple semantics; a null determines nothing).
    *
    * Shape: ONE aggregate computes all k + k·(k−1) distinct counts in
    * a single logical scan (Catalyst plans multi-distinct via Expand:
    * the scan is read once and fanned ~k² ways — the stated governor
    * is that `cols` is a PROFILING list, tens of columns, not a
    * schema dump; cost grows k²·rows pre-combine, map-side partials
    * bound the shuffle). The one-row result is then unpivoted
    * driver-free via stack(). Returns (determinant, dependent,
    * n_det, n_pairs, holds) per ordered pair. */
  def fdDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate column in list")
    val pairs = for (a <- cols; b <- cols if a != b) yield (a, b)
    val aggs = cols.map(c => countDistinct(col(c)).as(s"__d_$c")) ++
      pairs.map { case (a, b) =>
        countDistinct(col(a), col(b)).as(s"__p_${a}__$b") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'$a', '$b', __d_$a, __p_${a}__$b" }.mkString(", ")
    one.select(expr(
        s"stack(${pairs.size}, $stacked) AS (determinant, dependent, n_det, n_pairs)"))
      .withColumn("holds", col("n_pairs") === col("n_det"))
  }

  /** Quantile normalization across a panel of groups (Bolstad et al.,
    * Bioinformatics 2003 — the microarray classic, now the standard
    * "force every source onto one reference distribution" feature
    * transform): each value is replaced by the cross-group mean of
    * the order statistics at its rank fraction, so after the
    * transform every group's sorted values follow the SAME reference
    * distribution while each row keeps its within-group rank. The
    * batch-effect killer for multi-source feature columns where
    * per-group z-scores ([[robustScale]]) fix location/scale but not
    * shape.
    *
    * Unequal group sizes use the nearest-rank-above lookup
    * j = ⌈i·n_h / n_g⌉ (exact integer ceil-div; equal sizes reduce to
    * the classic same-rank mean). All arithmetic is exact: integral
    * values in, floor-mean of G order statistics out — no float near
    * a boundary on either engine. Ties take ranks by (value, id) —
    * a total order, stated, so both engines agree.
    *
    * Shape: one rank window per group, a G-row size table broadcast
    * CROSS onto the ranked rows (n·G intermediate — G is the panel
    * width, small by the operator's own definition: a batch of
    * sources/arrays, not a cardinality), one hash join on (group,
    * rank) to fetch the order statistics, one aggregate back to one
    * row per input row. Nothing collects; skew bounded by group
    * sizes. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val ranked = df
      .select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("__i", row_number().over(w).cast("long"))
    val sizes = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    val hs = sizes.select(col(groupCol).as("__hg"), col("__n").as("__hn"))
    val lookup = ranked.select(col(groupCol).as("__hg"),
      col("__i").as("__j"), col(valueCol).as("__vh"))
    ranked.join(sizes, groupCol)
      .crossJoin(broadcast(hs))
      .withColumn("__j", expr("(__i * __hn + __n - 1) div __n"))
      .join(lookup, Seq("__hg", "__j"))
      .groupBy(col(groupCol), col(idCol), col(valueCol))
      .agg(sum(col("__vh")).as("__s"), count(lit(1)).as("__g"))
      // floor-mean via the nonneg-mod identity: negative values sum
      // negative, and truncating div would round the wrong way there
      .withColumn(s"qn_$valueCol",
        expr("(__s - pmod(__s, __g)) div __g"))
      .drop("__s", "__g")
  }

  /** Candidate-key discovery up to arity 2 — the UNIQUENESS
    * complement to [[fdDiscovery]]'s implication profiling (together
    * they are the profiling pair every schema-inference tool ships:
    * FDs say what a column determines, keys say what identifies a
    * row). For every single column and unordered column pair from the
    * stated profiling list: distinct count vs row count → `is_unique`,
    * and `is_minimal` = unique with NO unique proper subset (a pair
    * containing a unique column is a key, but a redundant one — the
    * minimality verdict is what an index/PK advisor consumes).
    *
    * Shape: the [[fdDiscovery]] contract — ONE aggregate computes all
    * k + k(k−1)/2 distinct counts (Catalyst Expand governor stated
    * there applies), stack() unpivots, and minimality is two
    * self-joins on the TINY unpivoted frame (≤ k(k+1)/2 rows), never
    * the data. Distinct-tuple semantics: a row with a NULL in the
    * combo still counts as a value (SQL `count(DISTINCT (a,b))` row
    * semantics on both engines — a nullable column can still be part
    * of a key candidate here; strict PK nullability is a separate
    * not_null expectation, E232). */
  def candidateKeys(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate column in list")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = Seq(count(lit(1)).as("__rows")) ++
      cols.map(c => countDistinct(struct(col(c))).as(s"__k_$c")) ++
      pairs.map { case (a, b) =>
        countDistinct(struct(col(a), col(b))).as(s"__k_${a}__$b") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = (cols.map(c =>
        s"'$c', CAST(NULL AS STRING), 1, __k_$c") ++
      pairs.map { case (a, b) => s"'$a', '$b', 2, __k_${a}__$b" })
      .mkString(", ")
    val n = cols.size + pairs.size
    val flat = one.select(col("__rows"), expr(
        s"stack($n, $stacked) AS (col_a, col_b, arity, n_distinct)"))
      .select(col("col_a"), col("col_b"), col("arity"),
        col("n_distinct"), col("__rows").as("n_rows"),
        (col("n_distinct") === col("__rows")).as("is_unique"))
    val singles = flat.filter(col("arity") === 1)
      .select(col("col_a").as("__c"), col("is_unique").as("__u"))
    flat
      .join(broadcast(singles.withColumnsRenamed(
        Map("__c" -> "__ca", "__u" -> "__ua"))),
        col("col_a") === col("__ca"), "left")
      .join(broadcast(singles.withColumnsRenamed(
        Map("__c" -> "__cb", "__u" -> "__ub"))),
        col("col_b") === col("__cb"), "left")
      .withColumn("is_minimal", col("is_unique") &&
        (col("arity") === 1 ||
          (!coalesce(col("__ua"), lit(false)) &&
            !coalesce(col("__ub"), lit(false)))))
      .select("col_a", "col_b", "arity", "n_distinct", "n_rows",
        "is_unique", "is_minimal")
  }

  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__n_$c"),
      count(when(col(c).isNull, 1)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"__n_$c").as("n_non_null"),
      col(s"__nn_$c").as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_str"),
      col(s"__max_$c").as("max_str"))): _*)
    wide.select(explode(entries).as("s")).select(col("s.*"))
  }

  /** [[tableStats]]' 100 TB form — the swap its scaladoc prescribes,
    * as tested code rather than advice: `approx_count_distinct` (HLL,
    * default rsd 5%) in place of the exact distinct counts. The
    * difference is not just precision: multiple exact countDistincts
    * make Catalyst EXPAND the scan |cols| ways (every input row
    * duplicated once per counted column — the dominant cost of q98's
    * plan), while HLL sketches are plain partial aggregates, so the
    * approx form is ONE un-expanded pass whatever |cols| is. The spec
    * asserts exactly that plan difference (Expand present vs absent)
    * plus the documented error bound vs the exact operator; counts,
    * min/max stay exact either way. Approximate ⇒ not hash-oracle-able
    * (the E23 precedent): suite-verified, no q-entry. */
  def tableStatsApprox(df: DataFrame, cols: Seq[String],
                       rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__n_$c"),
      count(when(col(c).isNull, 1)).as(s"__nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"__n_$c").as("n_non_null"),
      col(s"__nn_$c").as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_str"),
      col(s"__max_$c").as("max_str"))): _*)
    wide.select(explode(entries).as("s")).select(col("s.*"))
  }

  /** Numeric drift — [[categoricalDrift]]'s continuous sibling: the
    * two-sample Kolmogorov–Smirnov statistic max|F̂ₐ(v) − F̂_b(v)|,
    * computed as the exact integer max |cumAᵥ·N_b − cumBᵥ·Nₐ| over the
    * pooled DISTINCT values with one final division. One row out:
    * the statistic, and the value where the gap peaks (ties: the
    * smallest such value) — the natural "where did the distribution
    * move" diagnostic. NULLs are excluded (they belong to the
    * categorical monitor).
    *
    * The cumulative counts need a full-order window; it runs over the
    * distinct-value frame (already aggregated, |values| rows — fine
    * into the millions), not the corpus. Beyond that, swap in a
    * two-pass range-partitioned cumsum (per-range totals, then
    * offsets) — the statistic is unchanged. */
  /** Domain-concentration audit — EXACT integer Gini over per-group
    * row counts, the curation-health metric behind per-domain share
    * caps (a corpus where three domains hold half the documents needs
    * capping before training; RefinedWeb-style preps monitor exactly
    * this). Returns ONE row: group/total counts, the Gini coefficient
    * as an exact rational (gini_num/gini_den) plus its integer
    * permille, and the largest group's share in permille.
    *
    * Exactness without a global rank: the ascending-sort Gini
    * Σ(2i−n−1)·c_i collapses, for each distinct count VALUE v with
    * multiplicity m and L groups strictly smaller, to v·m·(2L+m−n) —
    * so gini_num = Σ v·m·(2L+m) − n·total, needing only a cumulative
    * sum over the counts-of-counts table. Ties need no tiebreak: the
    * coefficient sum over equal counts is order-invariant, which is
    * what makes the result partitioning-proof and oracle-exact.
    *
    * Scale shape: one shuffle for the group counts, then the window
    * runs over DISTINCT count values only (bounded by the largest
    * group's size, not by the number of groups — the [[ksDrift]]
    * pattern), and everything reduces to a 1-row aggregate. */
  def concentration(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
    val byVal = counts.groupBy(col("__c")).agg(count(lit(1)).as("__m"))
    val w = Window.orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("__L", coalesce(sum(col("__m")).over(w), lit(0L)))
      .agg(
        sum(col("__m")).as("__n"),
        sum(col("__c") * col("__m")).as("__t"),
        sum(col("__c") * col("__m") * (lit(2) * col("__L") + col("__m"))).as("__a"),
        max(col("__c")).as("__cmax"))
      .select(
        col("__n").as("n_groups"),
        col("__t").as("total_rows"),
        (col("__a") - col("__n") * col("__t")).as("gini_num"),
        (col("__n") * col("__t")).as("gini_den"),
        expr("((__a - __n * __t) * 1000) div (__n * __t)").as("gini_permille"),
        expr("(__cmax * 1000) div __t").as("top_share_permille"))
  }

  /** Exact discrete Lorenz curve over group sizes — the CURVE behind
    * [[concentration]]'s Gini scalar (the audit plots it; the Gini is
    * twice the area above it): one point per DISTINCT group-size
    * value, ascending, with cumulative group and row shares in exact
    * integer permille. Same counts-of-counts identity and the same
    * scale argument: every window here ranges over distinct SIZE
    * VALUES (bounded by the largest group), never over groups or
    * rows. Reading the tail: cum_rows_permille at the last few points
    * is "the top k size-classes hold X permille of the corpus". */
  def lorenzCurve(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("size"))
    val byVal = counts.groupBy(col("size")).agg(count(lit(1)).as("n_groups"))
    val w = Window.orderBy(col("size"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byVal.agg(sum(col("n_groups")).as("__ng"),
      sum(col("size") * col("n_groups")).as("__nr"))
    byVal
      .withColumn("cum_groups", sum(col("n_groups")).over(w))
      .withColumn("cum_rows", sum(col("size") * col("n_groups")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("size"), col("n_groups"), col("cum_groups"),
        col("cum_rows"),
        expr("(cum_groups * 1000) div __ng").as("cum_groups_permille"),
        expr("(cum_rows * 1000) div __nr").as("cum_rows_permille"))
  }

  def ksDrift(base: DataFrame, incoming: DataFrame,
              valueCol: String): DataFrame = {
    val v = col(valueCol)
    val pooled = base.filter(v.isNotNull).select(v.as("v"), lit(1L).as("__a"), lit(0L).as("__b"))
      .unionAll(incoming.filter(v.isNotNull).select(v.as("v"), lit(0L).as("__a"), lit(1L).as("__b")))
      .groupBy(col("v"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
    // r14: global running sums via the distributed prefix device —
    // the previous Window.orderBy form was the single-partition trap
    // (fine over distinct values at sf0.1, not at a distinct-heavy
    // 100 TB column)
    val cum = Distributed.prefixSums(pooled, "v", Seq("__ca", "__cb"))
      .select(col("v"), col("__ca_cum").as("__cuma"),
        col("__cb_cum").as("__cumb"))
    val tot = pooled.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"),
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")).as("__gap"),
        col("__na"), col("__nb"))
      .orderBy(col("__gap").desc, col("v"))
      .limit(1)
      .select(col("v").as("at_value"), col("__gap").as("ks_parts"),
        col("__na").as("n_base"), col("__nb").as("n_in"),
        (col("__gap").cast("double") / (col("__na") * col("__nb")).cast("double"))
          .as("ks"))
  }

  /** Quantile–quantile comparison table — [[ksDrift]] reports the MAX
    * EDF gap; this reports the CURVE a distribution review actually
    * reads (where in the distribution did the shift happen — tails,
    * median, everywhere): at the k−1 evenly spaced probe levels
    * i/k, the exact percentile of both sides and the difference.
    * Exact `percentile` keeps it oracle-checkable (the q38
    * quantile_cont parity); the output is k−1 rows regardless of
    * data size. At 100 TB swap both sides to [[approxPercentiles]]'
    * sketch — identical shape. NULLs excluded (they belong to the
    * categorical monitor). */
  def qqTable(base: DataFrame, incoming: DataFrame, valueCol: String,
              k: Int = 10): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val probs = (1 until k).map(i => i.toDouble / k)
    val arr = s"array(${probs.mkString(", ")})"
    val v = col(valueCol)
    val pb = base.filter(v.isNotNull)
      .agg(expr(s"percentile($valueCol, $arr)").as("__pb"))
    val pi = incoming.filter(v.isNotNull)
      .agg(expr(s"percentile($valueCol, $arr)").as("__pi"))
    pb.crossJoin(pi)
      .select(posexplode(col("__pb")).as(Seq("__i", "q_base")), col("__pi"))
      .select(
        expr(s"CAST(((__i + 1) * 1000) div $k AS BIGINT)").as("p_permille"),
        col("q_base"),
        element_at(col("__pi"), col("__i").cast("int") + 1).as("q_in"))
      .withColumn("qq_diff", col("q_in") - col("q_base"))
  }

  /** Functional-dependency violation report — the profiling question
    * schema inference and dbt-style tests both ask ("does A determine
    * B in this data?"): every determinant value with MORE than one
    * distinct dependent is a witness that the FD fails, returned with
    * its row count and dependent cardinality so the reviewer sees how
    * badly (2 dependents on 3 rows = a typo; 5 on 10k = not an FD at
    * all). An empty result IS the assertion that A → B holds. One
    * keyed aggregate with a single count(distinct) — the two-phase
    * hash-agg plan, no Expand (the q146 lesson). */
  def fdViolations(rows: DataFrame, determinant: String,
                   dependent: String): DataFrame =
    rows.groupBy(col(determinant))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(dependent)).as("n_dependents"))
      .filter(col("n_dependents") > 1)

  /** Benford first-digit audit (Benford 1938; Nigrini's fraud
    * screen) — naturally-grown monetary/size data concentrates on
    * low leading digits (digit 1 ≈ 30.1%), while fabricated or
    * truncated data flattens; the audit REPORTS the observed
    * distribution next to the expected permille so a reviewer (or a
    * threshold downstream) reads the skew directly. Exact integers
    * only: the leading digit comes from the DECIMAL string form of
    * the absolute value (no log10 floats — a float log at a power of
    * ten could round to the wrong digit); the expected column is the
    * PRECOMPUTED integer-permille Benford table (301, 176, 125, 97,
    * 79, 67, 58, 51, 46 — stated constants, not computed logs).
    * Zero/null values carry no leading digit and are excluded
    * (reported via n_excluded in the caller's hands; stated).
    *
    * Shape: one scan-side digit projection + one 9-row aggregate +
    * the 1-row total broadcast. */
  def benfordAudit(rows: DataFrame, valueCol: String): DataFrame = {
    val benford = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    val expected = benford.zipWithIndex
      .foldLeft(lit(0L)) { case (acc, (pm, i)) =>
        when(col("digit") === (i + 1), lit(pm)).otherwise(acc)
      }
    val digit = substring(
      abs(col(valueCol)).cast("decimal(28,6)").cast("string"), 1, 1)
      .cast("int")
    val counts = rows
      .filter(col(valueCol).isNotNull && abs(col(valueCol)) >= 1)
      .select(digit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__t"))))
      .select(col("digit"), col("n"),
        expr("(n * 1000) div __t").as("observed_permille"),
        expected.as("benford_permille"))
  }

  /** OLAP CUBE report over two dimensions — the subtotal/grand-total
    * rollup every BI summary ships (per-cell, per-dim marginals, and
    * the grand total in ONE grouped aggregate): Catalyst's Expand
    * computes all four grouping sets in a single scan, vs four
    * separate aggregates + union. `grouping_id()` (lang-MSB bitmask,
    * the SQL-standard encoding both engines share) disambiguates a
    * rolled-up NULL from a data NULL. Output is bounded by
    * |d1|×|d2| + |d1| + |d2| + 1 — dimension products, never rows;
    * the single-scan Expand multiplies the SHUFFLED row count by the
    * number of grouping sets (4), which map-side partial aggregation
    * collapses before the exchange. */
  def cubeReport(rows: DataFrame, d1: String, d2: String,
                 valueCol: String): DataFrame =
    rows.cube(col(d1), col(d2))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
        sum(col(valueCol)).as("total_value"))

  /** Wide pivot matrix with an EXPLICIT column universe — the
    * cross-tab report. The explicit `colValues` list is the scale
    * contract: Spark's implicit pivot first runs a driver-side
    * collect of the distinct column values; passing the universe
    * keeps the whole plan declarative (one grouped aggregate with
    * one conditional-count column per value) and fixes the output
    * schema so downstream code doesn't chase data-dependent columns.
    * Absent cells are 0, not NULL (`na.fill` — the CASE-sum
    * convention the SQL twin uses natively). */
  def pivotMatrix(rows: DataFrame, rowDim: String, colDim: String,
                  colValues: Seq[String]): DataFrame = {
    require(colValues.nonEmpty, "need an explicit column universe")
    rows.groupBy(col(rowDim))
      .pivot(colDim, colValues)
      .agg(count(lit(1)))
      .na.fill(0L, colValues)
  }

  /** Wide→long reshape (melt) — [[pivotMatrix]]'s inverse and the
    * metric-table normalizer (a per-column metrics report becomes
    * (entity, metric, value) rows a generic monitor can consume).
    * Delegates to Spark's native `unpivot` (a single Expand node:
    * each input row fans to |valueCols| output rows in one pass —
    * no join, no union of scans, the plan a hand-rolled stack() or
    * N-way union would bloat). Value columns must share a common
    * type; NULL cells are KEPT (verified — a missing metric is a
    * fact a monitor wants, and the output is exactly \|valueCols\|
    * rows per input row). */
  def melt(rows: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "metric", valName: String = "value"): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    rows.unpivot(idCols.map(col).toArray,
      valueCols.map(col).toArray, varName, valName)
  }

  /** Inclusion-dependency discovery (the SINDY/SPIDER family —
    * Kruse et al., EDBT 2015) — foreign-key candidates found from
    * DATA, not declarations: across a set of integer key columns,
    * every ordered pair (child ⊆ parent) that holds exactly. The
    * companion to [[candidateKeys]] (uniqueness) and [[fdDiscovery]]
    * (intra-table dependence): together they reconstruct a schema's
    * constraint story from rows alone.
    *
    * The naive form is one anti-join per column pair (k² scans);
    * SINDY's inversion does it in ONE pass: per distinct value, the
    * set of columns containing it — an inclusion child ⊆ parent is
    * VIOLATED exactly when some value's set has child but not
    * parent, so exploding each value's (present × absent) pairs and
    * deduplicating yields every violation at once; the surviving
    * candidate pairs are the INDs. Per-value work ≤ k² with k a
    * config constant, so the whole pass costs the distinct-value
    * volume — never k² table scans.
    *
    * Contract: integer key columns (the FK case), NULLs ignored
    * (SQL FK semantics), self-pairs excluded. Coincidental INDs on
    * small domains surface BY DESIGN — discovery reports what
    * holds; meaning is the reader's join with [[candidateKeys]]. */
  def inclusionDiscovery(columns: Seq[(String, DataFrame, String)]): DataFrame = {
    require(columns.size >= 2, "need at least two columns")
    require(columns.map(_._1).distinct.size == columns.size,
      "column labels must be unique")
    val vals = columns.map { case (lbl, d, c) =>
      d.select(lit(lbl).as("col_id"), col(c).cast("long").as("__v"))
        .filter(col("__v").isNotNull).distinct()
    }.reduce(_ unionAll _).localCheckpoint()
    val counts = vals.groupBy(col("col_id")).agg(count(lit(1)).as("n"))
    val all = array(columns.map(c => lit(c._1)): _*)
    val violated = vals.groupBy(col("__v"))
      .agg(collect_set(col("col_id")).as("__present"))
      .select(explode(col("__present")).as("child"), col("__present"))
      .select(col("child"),
        explode(array_except(all, col("__present"))).as("parent"))
      .distinct()
    counts.select(col("col_id").as("child"), col("n").as("n_child"))
      .crossJoin(counts.select(col("col_id").as("parent"),
        col("n").as("n_parent")))
      .filter(col("child") =!= col("parent"))
      .join(violated, Seq("child", "parent"), "left_anti")
  }
}
