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

  /** FORWARD as-of: for every left row, the EARLIEST right row with
    * `right.time >= left.time` in the same key group — the mirror of
    * [[asof]] (next-quote-after-order, next-deploy-after-alert). Same
    * single-shuffle union plan, but the "earliest following" value is
    * computed as the running `last(ignoreNulls)` under the REVERSED
    * sort (time DESC, side DESC) — NOT `first()` over a
    * (currentRow, unboundedFollowing) frame: Spark's shrinking-frame
    * processor re-aggregates the frame remainder for every row, O(n²)
    * per partition (the q240 finding), while the reversed growing
    * frame is incremental O(n). Under the reversed order a
    * simultaneous right row (side DESC: right before left) has
    * already been seen when the left row is processed, preserving the
    * inclusive `>=` tie rule exactly. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  timeCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedRight = right.select(
      (keys.map(col) :+ col(timeCol).as(timeCol)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(1))
    val taggedLeft = left.withColumn("__side", lit(0))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** NEAREST as-of: the closer of the backward and forward matches,
    * ties to the BACKWARD row (stated — at equal distance the past is
    * the safer default: it was observable at left.time). Both
    * directions ride ONE union and ONE exchange; the forward value is
    * the running last under the REVERSED sort (the [[asofForward]]
    * O(n)-not-O(n²) rationale), so the plan carries two in-partition
    * sorts (asc + desc) over the same shuffle — the linear trade the
    * shrinking frame's quadratic re-aggregation is not. `timeCol`
    * must be castable to double for the distance compare
    * (timestamp/numeric — stated; pure dates should go through a
    * timestamp cast first). */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  timeCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // One ordering serves both frames: right=0 sorts before left=1 at
    // equal times, so the backward frame sees simultaneous right rows
    // (inclusive <=) while the forward frame — starting AT the left
    // row — excludes them. That asymmetry is harmless by
    // construction: a simultaneous row has distance 0, backward finds
    // it, and the tie rule prefers backward anyway.
    val taggedRight = right.select(
      (keys.map(col) :+ col(timeCol).as(timeCol)) :+
        struct((rightCols.map(col) :+
          col(timeCol).cast("double").as("__rt")): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    val taggedLeft = left.withColumn("__side", lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // ordering (time, __side): right rows sort BEFORE the left row at
    // equal times. Backward frame includes them (inclusive <=)...
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
    val back = last(col("__r"), ignoreNulls = true)
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // ...and the forward value is the running last under the REVERSED
    // order. Tie check: (time DESC, __side DESC) puts the left row
    // (side 1) BEFORE a simultaneous right row (side 0), so that right
    // row is not yet seen at the left row — the exclusive forward
    // semantics the old shrinking frame had, preserved: it already
    // matched backward, and at equal distance backward wins anyway.
    val fwd = last(col("__r"), ignoreNulls = true)
      .over(Window.partitionBy(keys.map(col): _*)
        .orderBy(col(timeCol).desc, col("__side").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val lt = col(timeCol).cast("double")
    val pick = when(col("__f").isNull, col("__b"))
      .when(col("__b").isNull, col("__f"))
      .when(lt - col("__b.__rt") <= col("__f.__rt") - lt, col("__b"))
      .otherwise(col("__f"))
    unioned
      .withColumn("__b", back).withColumn("__f", fwd)
      .filter(col("__side") === 1)
      .withColumn("__asof", pick)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
