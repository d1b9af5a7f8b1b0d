package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for every left row, the most recent right row
  * with `right.time <= left.time` within the same key group — the
  * canonical time-series alignment operator (quote-at-trade,
  * last-touch attribution, latest-state-at-event).
  *
  * Plan shape: tag both sides, union, ONE shuffle on the key, sort
  * within partitions by (time, side), then `last(_, ignoreNulls)` over
  * a running frame carries the latest right-side values forward onto
  * left rows. No range-join explosion, no per-key loop, no custom
  * physical operator needed — cost is one exchange + in-partition
  * sort regardless of time-range density, which is exactly what a
  * dedicated as-of SparkPlan would buy.
  *
  * Tie rule: a right row at exactly left.time matches (right sorts
  * before left at equal timestamps). Ties WITHIN the right side must
  * be resolved by the caller (e.g. keep-latest per (key, time) via
  * [[graft.etl.Merge.dedupKeepFirst]]) — otherwise "the" most recent
  * row is not well defined in any engine.
  */
object AsofJoin {

  /** @param rightCols right-side columns to carry onto left rows
    *                   (emitted as `asof_<name>`, NULL when no right
    *                   row precedes the left row). */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right, 1 = left: at equal times the right row sorts
    // first, so an exactly-simultaneous right row is visible to the
    // left row's running frame (inclusive <=).
    //
    // The carried columns ride as ONE struct with one last(ignoreNulls)
    // — carrying them independently would fill a NULL field of the
    // matched row from an OLDER right row, stitching values from
    // different rows (not as-of semantics). The struct itself is
    // non-null for every right row, so last() always picks the matched
    // row whole, NULL fields included; it is also one window
    // expression instead of |rightCols|.
    val taggedRight = right.select(
      (keys.map(col) :+ col(timeCol).as(timeCol)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    val taggedLeft = left.withColumn("__side", lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
