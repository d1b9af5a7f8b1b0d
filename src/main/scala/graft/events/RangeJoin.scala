package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval range join: for every point row, the
  * interval rows whose [start, end] contains it — WITHOUT an equi-key
  * (the hard case: with one, the range predicate just rides a normal
  * equi-join).
  *
  * Naive Spark compiles a pure range predicate to
  * BroadcastNestedLoopJoin — |points|·|intervals| comparisons, a
  * scale-killer. The bucketed form turns it into an equi-join:
  * time is quantized into fixed-width buckets, each interval is
  * exploded to every bucket it overlaps, each point belongs to exactly
  * ONE bucket, and the join is on the bucket id with the exact range
  * check as a post-filter. A matching (point, interval) pair meets in
  * exactly one bucket (the point's), so no dedup pass is needed.
  *
  * Cost: |intervals| × avg-span/width exploded rows + an equi-join —
  * both shuffle-partitionable. `bucketWidth` trades replication
  * (narrow buckets) against per-bucket fanout (wide buckets); set it
  * near the median interval span so most intervals explode to ≤ 2
  * buckets.
  */
object RangeJoin {

  /** @param points    left side, one timestamp column `ptCol`
    * @param intervals right side with `startCol`/`endCol` (inclusive
    *                  bounds, the SQL BETWEEN contract). Inverted
    *                  intervals (end < start) match no point under
    *                  BETWEEN, so they are dropped before the explode —
    *                  without the guard, `sequence(b0, b1)` would emit a
    *                  DESCENDING bucket list: wasted candidate rows that
    *                  the exact post-filter then discards one by one.
    * @param bucketWidthSec bucket quantum in seconds
    * @param maxBucketsPerInterval fail-fast ceiling on per-interval
    *                  fanout: an interval spanning more than this many
    *                  buckets (bad data or a mis-sized `bucketWidthSec`)
    *                  would explode to millions of rows or hit Spark's
    *                  sequence length cap mid-job; better a clear error
    *                  at the first offending row.
    * @return each matched pair: all point columns + all interval
    *         columns (caller projects). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      bucketWidthSec: Long = 3600L,
                      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketWidthSec).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      // assert_true returns NULL when the predicate holds and throws
      // with the message otherwise; riding the filter keeps it in the
      // executed plan (a dropped projection column could be pruned).
      .filter(assert_true(
        bucketOf(col(endCol)) - bucketOf(col(startCol)) < lit(maxBucketsPerInterval),
        concat(lit(s"range-join interval spans more than $maxBucketsPerInterval " +
          s"buckets of ${bucketWidthSec}s (start="), col(startCol).cast("string"),
          lit(", end="), col(endCol).cast("string"),
          lit("); widen bucketWidthSec or clean the interval"))).isNull)
      .withColumn("__b0", bucketOf(col(startCol)))
      .withColumn("__b1", bucketOf(col(endCol)))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    p.join(i, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
