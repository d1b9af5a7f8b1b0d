package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 builder — the Kimball dimension
  * pattern the reference's MERGE upsert (loaders.py:214-258's
  * insert-or-replace) deliberately forgets: instead of overwriting a
  * key's attributes in place, every attribute CHANGE opens a validity
  * interval `[valid_from, valid_to)` and closes the previous one, so
  * point-in-time queries ("what was this user's tier when the order
  * was placed?") join against history instead of reading today's
  * value — the training-data twin is feature tables that must be
  * point-in-time correct to avoid leakage (the time-axis cousin of
  * [[Sampling.purgedTimeFolds]]'s split guard).
  *
  * Construction is two window passes over ONE exchange+sort:
  * `(key) × (ts, attrs)` ordering marks run STARTS (row 1, or any
  * attribute differing null-safely from its lag), a filter keeps only
  * start rows — consecutive equal snapshots collapse, the SCD2
  * compaction — and `lead(ts)` over the SAME partitioning/ordering
  * closes each interval with the next start's timestamp. The filter
  * preserves both partitioning and order, so Catalyst plans a single
  * Exchange for the whole build (spec-asserted); nothing is collected
  * and per-key state is the window frame, never the corpus.
  *
  * Determinism: ties on `ts` order by the attribute values
  * themselves, so equal-timestamp change feeds build the same
  * intervals under any partitioning (two DIFFERENT attribute rows on
  * the same key+ts are genuinely ambiguous history — they resolve in
  * attribute sort order, documented rather than random).
  */
object Scd {

  /** Build the SCD2 interval table from a change feed: one row per
    * (key, attribute-run), with `valid_from` = the run's first
    * timestamp, `valid_to` = the next run's start (NULL = still
    * current), and an `is_current` flag. */
  def scd2(changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
           tsCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attribute columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: attrCols.map(col)): _*)
    // Null-safe change test per attribute; row_number covers the first
    // row, whose lag is NULL (an all-NULL first attribute would
    // otherwise compare "equal" to the missing predecessor and vanish).
    val changed = attrCols.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    changes
      .withColumn("__start", row_number().over(w) === 1 || changed)
      .filter(col("__start"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ attrCols.map(col)
        ++ Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /** Point-in-time snapshot of an SCD2 dimension: the rows whose
    * interval covers `at` (half-open: `valid_from <= at < valid_to`,
    * open intervals cover everything from their start). A filter, not
    * a join — compose with [[graft.events.RangeJoin]] /
    * [[graft.events.AsofJoin]] when the lookup instant varies per
    * fact row. */
  def snapshotAt(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
