package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Config-driven data-contract expectations — the generic rule
  * runner next to [[Validators]]' fixed probes (the reference's
  * validators are code; production contracts are CONFIG reviewed by
  * data owners — the dbt-tests / expectations pattern): a declarative
  * list of (name, kind, column, arg) rules, each compiled to one
  * aggregate expression, all evaluated in ONE scan. Kinds:
  *
  *   - `not_null`               — violations = NULL rows
  *   - `unique`                 — duplicate NON-NULL rows (nulls are
  *                                not equal to each other in SQL;
  *                                pair with not_null to forbid them)
  *   - `min` / `max` (arg)      — rows strictly outside the bound
  *   - `accepted_values` (arg = comma list) — non-null rows outside
  *                                the set
  *   - `rlike` (arg = regex)    — non-null rows NOT matching
  *
  * Violation COUNTS, not booleans — a gate can threshold (0 for hard
  * contracts, permille for soft ones) and an audit can trend them.
  * `arg` is spliced as a SQL fragment (config is code-reviewed input
  * by definition — stated). One hash-aggregate pass; `unique` rules
  * add distinct sub-aggregates (Expand), bounded by the rule list. */
object Expectations {

  final case class Expectation(name: String, kind: String,
                               column: String, arg: String = "")

  def runExpectations(df: DataFrame,
                      rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be unique")
    val aggs = rules.map { r =>
      val c = r.column
      val e = r.kind match {
        case "not_null" => s"count(CASE WHEN $c IS NULL THEN 1 END)"
        case "unique" =>
          s"count($c) - count(DISTINCT $c)"
        case "min" => s"count(CASE WHEN $c < ${r.arg} THEN 1 END)"
        case "max" => s"count(CASE WHEN $c > ${r.arg} THEN 1 END)"
        case "accepted_values" =>
          val set = r.arg.split(",").map(v => s"'${v.trim}'").mkString(", ")
          s"count(CASE WHEN $c IS NOT NULL AND CAST($c AS STRING) " +
            s"NOT IN ($set) THEN 1 END)"
        case "rlike" =>
          s"count(CASE WHEN $c IS NOT NULL AND NOT CAST($c AS STRING) " +
            s"RLIKE '${r.arg}' THEN 1 END)"
        case other => throw new IllegalArgumentException(
          s"unknown expectation kind '$other'")
      }
      expr(e).as(s"__${r.name}")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r =>
      s"'${r.name}', '${r.kind}', '${r.column}', __${r.name}")
      .mkString(", ")
    one.select(expr(s"stack(${rules.size}, $stacked) " +
        "AS (rule, kind, column, n_violations)"))
      .withColumn("passed", col("n_violations") === 0)
  }
}
