package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic distribution profiling — the "what does this column look
  * like" pass a pipeline runs before choosing thresholds (quality
  * cut-offs, bin boundaries, partition sizing). One hash aggregation;
  * at any scale the output is bounded by the bin count, never the row
  * count. */
object Profiling {

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
