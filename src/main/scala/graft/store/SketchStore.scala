package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches as a STORED pre-aggregate — the
  * pattern that makes "distinct users per X over an arbitrary date
  * range" an O(groups) metadata query instead of a 100 TB rescan:
  * per (group) a Datasketches HLL sketch (Spark's native
  * `hll_sketch_agg`, binary, ~KB) persisted beside its row count;
  * later ANY rollup — coarser dimensions, unions of days, the grand
  * total — is `hll_union_agg` over the stored sketches, because HLL
  * union is exact over the sketch lattice (the union of two days'
  * sketches IS the sketch of the union — the property a plain
  * distinct-count pre-aggregate fatally lacks: distincts don't add).
  *
  * Incremental by construction: [[appendDistinctSketches]] writes a
  * new batch's groups as new rows; reads union duplicates away. The
  * raw data is touched once per batch, ever.
  *
  * Approximate (±~1.6% at the default lgConfigK=12), hence
  * spec-verified against exact distincts with error-bound asserts
  * (the E23/E190 precedent) — no DuckDB twin exists for the sketch
  * binary format. Exact twins stay with E23/A7 where exactness is
  * the contract. */
object SketchStore {

  /** One row per group: (groupCols…, sketch BINARY, n_rows). */
  def writeDistinctSketches(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, path: String): Unit =
    sketchFrame(df, groupCols, valueCol)
      .write.mode("overwrite").parquet(path)

  /** Append a new batch's sketches — same schema, new rows; overlap
    * with existing groups is fine (union-at-read merges them). */
  def appendDistinctSketches(df: DataFrame, groupCols: Seq[String],
                             valueCol: String, path: String): Unit =
    sketchFrame(df, groupCols, valueCol)
      .write.mode("append").parquet(path)

  private def sketchFrame(df: DataFrame, groupCols: Seq[String],
                          valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"),
        count(col(valueCol)).as("n_rows"))

  /** Roll stored sketches up to `rollupCols` (any subset of the
    * stored group columns, or empty for the grand total): approximate
    * distinct + exact row count per rollup group, reading ONLY the
    * sketch table. */
  def distinctCounts(spark: SparkSession, path: String,
                     rollupCols: Seq[String]): DataFrame = {
    val s = spark.read.parquet(path)
    val aggs = Seq(
      hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"),
      sum(col("n_rows")).as("n_rows"))
    if (rollupCols.isEmpty) s.agg(aggs.head, aggs.tail: _*)
    else s.groupBy(rollupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---- Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) ----
  //
  // The FREQUENCY complement to the HLL distinct store: "how often
  // did key k occur" over an arbitrary union of stored batches,
  // answered from depth×width counters instead of a rescan. Like
  // distinct counts, per-key frequencies don't pre-aggregate across
  // batches unless the key survives as a group — the sketch's
  // fixed-size counter grid does: merge IS elementwise addition, so
  // the sketch of a union is the sum of the sketches. Guarantees:
  // est ≥ true always (counters only ever add), and
  // est ≤ true + (e/width)·N with probability 1 − e^(−depth).
  //
  // Unlike the HLL binary, every counter is a pure function of md5 —
  // both engines replay the build and the point queries exactly, so
  // this sketch IS hash-oracle-able (q237), not just spec-bounded.

  /** Row-`r` counter column for `key`: md5-derived (engine-neutral,
    * [[graft.etl.Sampling.keyHash]]'s 56-bit idiom), nonnegative. */
  def cmsBucket(key: Column, row: Column, width: Int): Column =
    graft.etl.Sampling.keyHash(
      concat_ws("|", key.cast("string"), row.cast("string"))) % width

  /** Build: one row per touched (r, c) counter — at most depth×width
    * rows regardless of input size. One explode (×depth) feeding one
    * hash aggregate with map-side combine; counters, never keys,
    * cross the shuffle. */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int = 4,
                width: Int = 256): DataFrame =
    df.select(col(keyCol).cast("string").as("__k"))
      .select(col("__k"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .select(col("r"), cmsBucket(col("__k"), col("r"), width).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))

  /** Merge any number of sketch frames built with the SAME
    * (depth, width): elementwise counter addition. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `keys` (a frame with `keyCol`): min over the
    * depth rows of the addressed counters, 0 for never-touched
    * buckets. The sketch side is ≤ depth×width rows — broadcast onto
    * the keys; the probe never shuffles the sketch. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame =
    keys.select(col(keyCol),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("c", cmsBucket(col(keyCol), col("r"), width))
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
}
