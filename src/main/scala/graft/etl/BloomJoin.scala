package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** Bloom-pre-filtered semi join — the scale pattern for "keep fact
  * rows whose key appears in a big dimension" when the dimension's
  * distinct-key set is too large to broadcast exactly but a few-MB
  * bloom fits anywhere.
  *
  * Semantics are EXACTLY `left SEMI JOIN right`: the bloom admits
  * ~fpp false positives, and the exact semi join that follows removes
  * them — the sketch only decides which rows pay the shuffle. At
  * 100 TB the win is the shuffle delta: a selective probe (say 2% of
  * fact keys present) ships ~2%+fpp of the fact table instead of all
  * of it, for one extra aggregation pass over the (much smaller)
  * right side to build the filter.
  *
  * `expectedItems`/`fpp` size the filter: bits ≈ -n·ln(fpp)/ln(2)²,
  * so 10⁸ keys at 1% ≈ 120 MB — still broadcastable; tune fpp up if
  * the key set grows past that.
  */
object BloomJoin {

  /** @param leftKey  join key on `left` (bigint or string)
    * @param rightKey join key on `right`
    * @return rows of `left` whose key appears in `right` (semi-join
    *         projection: left columns only) */
  def semiJoinWithBloom(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        expectedItems: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    // distributed build (one aggregation over right), tiny driver object
    val bloom = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val pre = left.filter(SketchFunctions.bloomMightContain(col(leftKey), bloom))
    pre.join(right.select(col(rightKey).as("__rk")),
      col(leftKey) === col("__rk"), "left_semi")
  }
}
