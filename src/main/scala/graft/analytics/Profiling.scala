package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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
}
