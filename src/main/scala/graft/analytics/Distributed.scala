package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-statistics primitives.
  *
  * The running-total-by-global-order idiom (`sum(...).over(
  * Window.orderBy(k))`) is the single-partition trap: Spark executes
  * an unpartitioned window by moving ALL rows to one task — the WARN
  * in the logs is the 100 TB job that never finishes. [[prefixSums]]
  * is the E223 globalRowIndex device generalized from prefix-COUNT to
  * prefix-SUM, and the shared engine under exact AUC ([[
  * Ranking.rocAuc]]), exact global quantiles ([[
  * Profiling.exactQuantiles]]) and the KS drift statistic ([[
  * Profiling.ksDrift]]): range-repartition on the order key (so
  * partition i's keys all precede partition i+1's), an ordinary
  * partitioned running sum WITHIN each partition, and a
  * #partitions-sized per-partition total table cumulated into offsets
  * and broadcast back. `global running sum = offset + local running
  * sum` — every step distributed, the only serial object is the
  * offset table (one row per partition).
  *
  * Determinism: range boundaries come from sampling and may vary run
  * to run, but the emitted sums are a pure function of the total
  * order — whichever partition a row lands in, offset + local is its
  * global prefix. `orderCol` must therefore be UNIQUE per row
  * (callers aggregate to distinct keys first — which is also what
  * keeps the sorted frame small: distinct values, not rows). */
object Distributed {

  /** Appends, for each `c` in `sumCols`, an INCLUSIVE global running
    * sum `<c>_cum` ordered by `orderCol`. Exclusive prefixes are
    * `cum − own` at the call site. */
  def prefixSums(df: DataFrame, orderCol: String,
                 sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "need at least one column to sum")
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"__loc_$c", sum(col(c)).over(wLoc))
    }
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col(sumCols.head)).as(s"__t_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"__t_$c")): _*)
      .select(col("__pid") +: sumCols.map(c =>
        coalesce(sum(col(s"__t_$c")).over(wOff), lit(0L))
          .as(s"__off_$c")): _*)
    val joined = local.join(broadcast(offsets), "__pid")
    val withCums = sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_cum", col(s"__off_$c") + col(s"__loc_$c"))
    }
    withCums.drop("__pid" +: sumCols.flatMap(c =>
      Seq(s"__loc_$c", s"__off_$c")): _*)
  }

  /** Appends the EXCLUSIVE global running max of `valCol` ordered by
    * `orderCol` as `outCol` — NULL where no strictly-preceding row
    * exists. Same device as [[prefixSums]] (range repartition + local
    * window + partition-total offsets), with the one twist maxes
    * force: an exclusive max cannot be recovered from an inclusive
    * one (`cum − own` has no max analogue), so the LOCAL window is
    * itself exclusive (frame ends at −1) and the offset table carries
    * the running max of whole-partition maxima over strictly
    * preceding partitions. `orderCol` must be unique per row (same
    * contract as prefixSums — callers pass distinct keys). */
  def exclusivePrefixMax(df: DataFrame, orderCol: String, valCol: String,
                         outCol: String): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(max(col(valCol)).as("__pmax"))
      .select(col("__pid"), max(col("__pmax")).over(wOff).as("__offmax"))
    ranged
      .withColumn("__locmax", max(col(valCol)).over(wLoc))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol,
        when(col("__locmax").isNull, col("__offmax"))
          .when(col("__offmax").isNull, col("__locmax"))
          .otherwise(greatest(col("__locmax"), col("__offmax"))))
      .drop("__pid", "__locmax", "__offmax")
  }
}
