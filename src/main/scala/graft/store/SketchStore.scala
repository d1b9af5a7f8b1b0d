package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
