package graft.quality

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Validation result shape, mirroring the reference's
  * `{passed, errors, warnings, metrics}` contract
  * (reference `dags/utils/validators.py:75-80`,
  * `plugins/custom_operators/data_quality.py:79-85`). */
case class ValidationResult(
    passed: Boolean,
    errors: Seq[String],
    warnings: Seq[String],
    metrics: Map[String, Any]) {
  def ++(other: ValidationResult): ValidationResult = ValidationResult(
    passed && other.passed, errors ++ other.errors,
    warnings ++ other.warnings, metrics ++ other.metrics)
}

/** Extension point mirroring the reference's `validation_callable`
  * contract (`data_quality.py:24,40,79`). */
trait Validator {
  def validate(df: DataFrame): ValidationResult
}

/** Data-quality gates (SURVEY.md §2.3 P10–P17, §3.2; reference
  * `dags/utils/validators.py:64-459`). Design rule: each validator is
  * ONE `df.agg(...)` pass — every probe (null counts, min/max,
  * thresholds, dup counts) is an aggregate expression in a single job,
  * the distributed analog of the reference's one-pass-over-pandas.
  * The reference's serial per-symbol loops become shuffle aggregations.
  */
object Validators {

  private def nullCount(c: String): Column =
    count(when(col(c).isNull, 1)).as(s"null_$c")

  /** Shared single-pass core: run the base probes plus any
    * caller-supplied extra aggregate probes in ONE `df.agg`, and build
    * the base error list. Returns (row, result-so-far) so callers can
    * layer rule-specific warnings without a second Spark job. */
  private def probe(
      df: DataFrame,
      requiredColumns: Seq[String],
      today: Column,
      extraAggs: Seq[Column],
      ageWarnDays: Int = 365): Either[ValidationResult, (Row, ValidationResult)] = {
    val missing = requiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      return Left(ValidationResult(passed = false,
        errors = Seq(s"missing required columns: ${missing.mkString(",")}"),
        warnings = Nil, metrics = Map("missing_columns" -> missing)))

    // Build probes only for columns the caller actually requires — a
    // column list without `close`/`symbol`/`date` is legitimate and must
    // degrade to fewer probes, not an unresolved-column error.
    val has = requiredColumns.toSet
    val dateCol = to_date(col("date"))
    val aggs: Seq[Column] = Seq(count(lit(1)).as("row_count")) ++
      (if (has("symbol")) Seq(countDistinct(col("symbol")).as("unique_symbols")) else Nil) ++
      (if (has("close")) Seq(
        min(col("close")).as("min_close"),
        max(col("close")).as("max_close"),
        count(when(col("close") < 0, 1)).as("negative_close")) else Nil) ++
      (if (has("date")) Seq(
        count(when(dateCol > today, 1)).as("future_dates"),
        min(dateCol).as("oldest_date"),
        max(dateCol).as("newest_date"),
        // P14 (reference validators.py:146-150): any bars older than a
        // year draw a warning — probed in the same single pass.
        max(when(dateCol < date_sub(today, ageWarnDays), 1).otherwise(0))
          .as("age_warn")) else Nil) ++
      requiredColumns.map(nullCount) ++ extraAggs
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    if (r.getLong(r.fieldIndex("row_count")) == 0)
      return Left(ValidationResult(passed = false, errors = Seq("empty input"),
        warnings = Nil, metrics = Map("row_count" -> 0L)))

    def longOr0(f: String): Long =
      if (r.schema.fieldNames.contains(f)) r.getLong(r.fieldIndex(f)) else 0L
    val errors = Seq(
      (longOr0("negative_close") > 0) ->
        s"${longOr0("negative_close")} rows with negative close",
      (longOr0("future_dates") > 0) ->
        s"${longOr0("future_dates")} rows with future dates"
    ).collect { case (true, msg) => msg }

    val nullClose = longOr0("null_close")
    val allErrors = errors ++
      (if (nullClose > 0) Seq(s"$nullClose null close values") else Nil)

    def intOr0(f: String): Int =
      if (r.schema.fieldNames.contains(f)) r.getInt(r.fieldIndex(f)) else 0
    val warnings =
      if (intOr0("age_warn") == 1)
        Seq(s"data older than $ageWarnDays days present " +
          s"(oldest=${r.get(r.fieldIndex("oldest_date"))})")
      else Nil

    Right((r, ValidationResult(
      passed = allErrors.isEmpty,
      errors = allErrors,
      warnings = warnings,
      metrics = r.schema.fieldNames.map(f => f -> r.get(r.fieldIndex(f))).toMap)))
  }

  /** Raw-data validation (reference `validators.py:64-162`): empty
    * check, required columns, negative close, future dates, null
    * profile — one aggregation pass. */
  def validateRaw(
      df: DataFrame,
      requiredColumns: Seq[String] =
        Seq("date", "symbol", "open", "high", "low", "close", "volume", "data_source"),
      today: Column = current_date()): ValidationResult =
    probe(df, requiredColumns, today, Nil).fold(identity, _._2)

  /** Transformed-data validation (reference `validators.py:165-251`):
    * the raw checks plus threshold warnings (close>10000, volume>1e9,
    * volatility>20) — still ONE aggregation pass: the threshold probes
    * ride in the same agg as the base probes. */
  def validateTransformed(
      df: DataFrame,
      today: Column = current_date(),
      priceCap: Double = 10000.0,
      volumeCap: Double = 1e9,
      volatilityCap: Double = 20.0): ValidationResult = {
    val thresholds = Seq(
      count(when(col("close") > priceCap, 1)).as("over_price_cap"),
      count(when(col("volume") > volumeCap, 1)).as("over_volume_cap"),
      count(when(col("daily_volatility") > volatilityCap, 1)).as("over_volatility_cap"))
    probe(df,
      requiredColumns = Seq("date", "symbol", "open", "high", "low", "close",
        "volume", "data_source", "processed_at", "daily_change_pct", "daily_volatility"),
      today = today, extraAggs = thresholds).fold(identity, { case (r, base) =>
      def n(f: String): Long = r.getLong(r.fieldIndex(f))
      val warnings = Seq(
        (n("over_price_cap") > 0) -> s"${n("over_price_cap")} rows with close > $priceCap",
        (n("over_volume_cap") > 0) -> s"${n("over_volume_cap")} rows with volume > $volumeCap",
        (n("over_volatility_cap") > 0) ->
          s"${n("over_volatility_cap")} rows with volatility > $volatilityCap"
      ).collect { case (true, msg) => msg }
      base.copy(warnings = base.warnings ++ warnings)
    })
  }

  /** Duplicate-key count (reference `validators.py:153,227`):
    * total extra rows beyond the first per key. */
  def duplicateCount(df: DataFrame, keys: Seq[String]): Long = {
    val r = df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L)))
      .collect()(0)
    r.getLong(0)
  }

  /** Freshness gate (reference `validate_data_freshness`,
    * `validators.py:254-309`): newest date must be within
    * `maxAgeDays` of `today`. The batch analog of a watermark. */
  def validateFreshness(
      df: DataFrame, dateCol: String = "date",
      maxAgeDays: Int = 1, today: Column = current_date()): ValidationResult = {
    val r = df.agg(
      max(col(dateCol)).as("newest"),
      min(col(dateCol)).as("oldest"),
      max(when(col(dateCol) >= date_sub(today, maxAgeDays), 1).otherwise(0)).as("fresh"))
      .collect()(0)
    val fresh = !r.isNullAt(2) && r.getInt(2) == 1
    ValidationResult(
      passed = fresh,
      errors = if (fresh) Nil else Seq(s"stale data: newest=${r.get(0)} older than $maxAgeDays days"),
      warnings = Nil,
      metrics = Map("newest_date" -> r.get(0), "oldest_date" -> r.get(1)))
  }

  /** Symbol-coverage gate (reference `validate_symbol_coverage`,
    * `validators.py:312-365`): required − actual = missing,
    * actual − required = extra. Distinct symbol sets are tiny, so the
    * set diff collects then compares driver-side. */
  def validateCoverage(df: DataFrame, required: Seq[String],
      symbolCol: String = "symbol"): ValidationResult = {
    val actual = df.select(col(symbolCol)).distinct()
      .collect().map(_.getString(0)).toSet
    val missing = required.toSet -- actual
    val extra = actual -- required.toSet
    ValidationResult(
      passed = missing.isEmpty,
      errors = if (missing.isEmpty) Nil else Seq(s"missing symbols: ${missing.toSeq.sorted.mkString(",")}"),
      warnings = if (extra.isEmpty) Nil else Seq(s"unexpected symbols: ${extra.toSeq.sorted.mkString(",")}"),
      metrics = Map("missing" -> missing.toSeq.sorted, "extra" -> extra.toSeq.sorted))
  }

  /** Cross-source consistency (J2, reference `validators.py:233-244`):
    * the reference's O(symbols×dates) nested loop re-expressed as one
    * shuffle aggregation — groups with >1 source whose close values
    * diverge more than `maxPctDiff`. */
  def crossSourceInconsistencies(df: DataFrame, maxPctDiff: Double = 5.0): DataFrame = {
    df.groupBy(col("date"), col("symbol"))
      .agg(
        min(col("close")).as("min_close"),
        max(col("close")).as("max_close"),
        countDistinct(col("data_source")).as("n_sources"))
      .filter(col("n_sources") > 1)
      .withColumn("pct_diff", (col("max_close") - col("min_close")) / col("min_close") * 100)
      .filter(col("pct_diff") > maxPctDiff)
  }

  /** Schema-compatibility probe (reference
    * `validate_bigquery_schema_compatibility`, `validators.py:410-459`):
    * counts of values that fail to coerce to the declared type —
    * `try_cast(c as t) IS NULL AND c IS NOT NULL` per column, one pass.
    * try_cast (not cast) so the probe returns counts instead of
    * throwing under ANSI evaluation mode. */
  def castFailureCounts(df: DataFrame, declared: Map[String, String]): Map[String, Long] = {
    val probes = declared.toSeq.map { case (c, t) =>
      count(when(col(c).try_cast(t).isNull && col(c).isNotNull, 1)).as(c)
    }
    val r = df.agg(probes.head, probes.tail: _*).collect()(0)
    declared.keys.map(c => c -> r.getLong(r.fieldIndex(c))).toMap
  }

  /** Privacy-risk audit over a release candidate (Sweeney's
    * k-anonymity + Machanavajjhala's l-diversity): for every
    * quasi-identifier combination, the group size (re-identification
    * risk: a group smaller than k pins an individual to ≤ k-1 others)
    * and the number of distinct sensitive values (attribute-disclosure
    * risk: a group with < l values leaks the attribute even when the
    * individual stays anonymous). Every combination is reported with
    * both verdicts — the release gate downstream filters or
    * generalizes; the audit itself never hides a group. One hash
    * aggregate; output is bounded by the quasi-identifier domain. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1,
      "need quasi columns and positive k, l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_risk", col("group_size") < k)
      .withColumn("l_risk", col("n_sensitive") < l)
  }

  /** K-anonymization by generalization ladder — the RELEASE
    * counterpart to [[kAnonymityAudit]]'s report: the audit says
    * which groups re-identify; this operator picks the MINIMAL
    * generalization level (from a stated ladder of coarsening
    * expressions — exact values → bands → coarse bands → full
    * suppression, Sweeney's domain-generalization hierarchy) at which
    * EVERY equivalence class reaches size ≥ k, and emits the classes
    * at that level. Minimality is the utility contract: generalizing
    * past the first satisfying level destroys information k-anonymity
    * never asked for. If even the coarsest level fails, the coarsest
    * is emitted with its residual classes flagged `meets_k = false`
    * (the release gate's decision to suppress them stays visible,
    * never silent).
    *
    * Shape: one hash aggregate per ladder level (levels are a stated
    * config list — 3-5 rungs, not data-driven) and one driver-side
    * min per level (the Sampling.scala config-sized-collect
    * precedent: L scalars, never data). Class output is bounded by
    * the quasi-identifier domain at the chosen level. */
  def kAnonymize(df: DataFrame, levels: Seq[Seq[Column]],
                 names: Seq[String], k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    require(levels.forall(_.size == names.size),
      "every level must generalize every quasi-identifier")
    require(k >= 1, "k must be positive")
    def classes(l: Int) = df
      .groupBy(levels(l).zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("group_size"))
    val minAt = levels.indices.map { l =>
      val r = classes(l).agg(min(col("group_size"))).collect()(0)
      if (r.isNullAt(0)) Long.MaxValue else r.getLong(0) // empty input: trivially safe
    }
    val chosen = minAt.indexWhere(_ >= k) match {
      case -1 => levels.size - 1
      case i => i
    }
    classes(chosen)
      .withColumn("level", lit(chosen))
      .withColumn("meets_k", col("group_size") >= k)
  }

  /** ZERO-extra-pass quality metrics via Spark's Observation API: the
    * validator `df.agg(...)` probes above each cost one dedicated job
    * over the data — correct for a gate that must run BEFORE the
    * write, but a pipeline that is writing the data anyway shouldn't
    * scan 100 TB twice for row/null counts. `observed` piggybacks the
    * probes on whatever action the caller was about to run: metrics
    * accumulate inside the SAME tasks that execute the write (an
    * `observe` node in the plan, no second scan, no extra shuffle)
    * and are read from the returned Observation after the action
    * completes. Returns (instrumented df, observation); call
    * `observation.get` once the caller's action has run.
    *
    * The metric set mirrors the gate probes: row count, per-column
    * null counts, and min/max of `minMaxCol` if given. Aggregate-only
    * by the API's contract (observe rejects non-aggregate
    * expressions); distinct counts are NOT available this way — HLL
    * (`approx_count_distinct`) is the observable substitute and the
    * exact form stays with the dedicated validators. */
  def observed(df: DataFrame, name: String, nullCols: Seq[String],
               minMaxCol: Option[String] = None)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics: Seq[Column] =
      Seq(count(lit(1)).as("row_count")) ++
        nullCols.map(c => count(when(col(c).isNull, 1)).as(s"null_$c")) ++
        minMaxCol.toSeq.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          approx_count_distinct(col(c)).as(s"approx_distinct_$c")))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Referential-integrity + amount-reconciliation audit between a
    * parent and a child table — the FK checks a warehouse runs after
    * every load (dbt's relationship tests, Kimball's "orphan fact"
    * audit): (a) orphan children (FK with no parent — breaks every
    * parent-side join silently), (b) childless parents (headers with
    * no lines — usually a partial load), (c) header amounts not equal
    * to the sum of line amounts. Money compares in EXACT integer
    * cents (one DECIMAL(18,2) quantization per value, integer sums —
    * a double Σ would make the violation COUNT depend on accumulation
    * order), tolerance ±1 cent stated.
    *
    * Output: one row per check — (check, n_checked, n_violations,
    * violation_permille). Shape: two anti-joins + one grouped
    * equi-join, all keyed on the FK; three 1-row aggregates unioned.
    * Nothing collected. */
  def referentialAudit(parent: DataFrame, child: DataFrame,
                       parentKey: String, childKey: String,
                       parentAmount: String, childAmount: String): DataFrame = {
    def cents(c: Column) =
      (round(c.cast("decimal(28,10)"), 2).cast("decimal(18,2)") * 100)
        .cast("long")
    val p = parent.select(col(parentKey).as("__k"),
      cents(col(parentAmount)).as("__pc"))
    val c = child.select(col(childKey).as("__k"),
      cents(col(childAmount)).as("__cc"))
    def report(name: String, checked: DataFrame, bad: DataFrame) =
      checked.agg(count(lit(1)).as("n_checked"))
        .crossJoin(bad.agg(count(lit(1)).as("n_violations")))
        .select(lit(name).as("check"), col("n_checked"), col("n_violations"),
          expr("CASE WHEN n_checked = 0 THEN 0 " +
            "ELSE (n_violations * 1000) div n_checked END")
            .as("violation_permille"))
    val orphans = c.join(p.select("__k").distinct(), Seq("__k"), "left_anti")
    val childless = p.join(c.select("__k").distinct(), Seq("__k"), "left_anti")
    val recon = p.join(
        c.groupBy(col("__k")).agg(sum(col("__cc")).as("__sum")),
        Seq("__k"))
      .filter(abs(col("__pc") - col("__sum")) > 1)
    report("orphan_children", c, orphans)
      .unionByName(report("childless_parents", p, childless))
      .unionByName(report("amount_reconciliation",
        p.join(c.select("__k").distinct(), Seq("__k")), recon))
  }
}
