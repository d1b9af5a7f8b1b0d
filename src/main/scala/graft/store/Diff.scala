package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset-governance audit between two versions
  * of a table ("what changed between the corpus the last training run
  * read and today's?"): per key, `added` / `removed` / `changed` /
  * `unchanged`, with the exact set of changed columns named. Pairs
  * with [[Versioned]]'s time travel (diff `readVersion(v1)` against
  * `readVersion(v2)` to audit a commit range) but takes any two
  * frames — the reference's upsert counters (loaders.py:246-258
  * report inserted/replaced totals) are this operator's 1-row
  * shadow; the per-row, per-column form is what a data-lineage
  * review actually reads. [[graft.etl.Merge.diffByKey]] is the
  * status-only form of this audit (one label per key, oracled against
  * the upsert path); this operator deepens it to name WHICH columns
  * moved and to roll the answer up per column — use diffByKey when a
  * status partition is enough, this when the review needs blame.
  *
  * Shape at scale: ONE full-outer shuffle join on the key — linear,
  * unavoidable, and the only exchange; column comparison is
  * null-safe `<=>` per shared column, all codegen'd scalar work on
  * the joined row, nothing collected. Schema drift is handled by
  * comparing the INTERSECTION of non-key columns (a column present on
  * one side only is schema evolution, visible statically — not a
  * row-level change); `changed_cols` lists names in sorted column
  * order, comma-joined (deterministic, engine-neutral).
  */
object Diff {

  /** Row-level diff of `newDf` against `oldDf` on `keyCols`. Output:
    * the keys, `status`, and `changed_cols` ('' for added/removed/
    * unchanged rows). Keys must be unique per side — duplicate keys
    * would fan the full-outer join out row×row, silently turning the
    * audit quadratic; dedup first ([[graft.etl.Merge]]). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need key columns")
    val dataCols = oldDf.columns.filterNot(keyCols.contains)
      .intersect(newDf.columns).sorted.toSeq
    def tagged(df: DataFrame, side: String, mark: String) = {
      val renamed = dataCols.foldLeft(df.select((keyCols ++ dataCols).map(col): _*)) {
        (d, c) => d.withColumnRenamed(c, s"__${side}_$c")
      }
      renamed.withColumn(mark, lit(true))
    }
    val j = tagged(oldDf, "old", "__in_old")
      .join(tagged(newDf, "new", "__in_new"), keyCols, "full_outer")
    val perCol: Seq[Column] = dataCols.map(c =>
      when(!(col(s"__old_$c") <=> col(s"__new_$c")), lit(c)))
    val changed =
      when(col("__in_old").isNotNull && col("__in_new").isNotNull,
        concat_ws(",", array_compact(array(perCol: _*))))
      .otherwise(lit(""))
    j.withColumn("changed_cols", changed)
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("changed_cols") =!= "", lit("changed"))
          .otherwise(lit("unchanged")))
      .select((keyCols.map(col) :+ col("status") :+ col("changed_cols")): _*)
  }

  /** The audit rolled up: rows per status, plus how many rows changed
    * in each column (a changed row counts once per column it touched).
    * One partial aggregate over [[diff]]'s output. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
                  keyCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, keyCols)
      .select(col("status"),
        explode(concat(array(lit("*")),
          when(col("changed_cols") =!= "", split(col("changed_cols"), ","))
            .otherwise(array().cast("array<string>")))).as("col"))
      .groupBy(col("status"), col("col")).agg(count(lit(1)).as("n_rows"))
}
