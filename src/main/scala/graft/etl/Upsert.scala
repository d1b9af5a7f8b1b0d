package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-based MERGE upsert (SURVEY.md §2.2 K7, reference
  * `dags/utils/loaders.py:107-190`): WHEN MATCHED → take the staging
  * row (update all non-key columns), WHEN NOT MATCHED → insert.
  *
  * Spark-on-Parquet has no in-place MERGE, so the upsert is
  *   target ⟕anti staging  ∪  staging
  * Staging is the small side (a daily increment) → Catalyst broadcasts
  * it; the target is never shuffled. At 100 TB the rewrite must be
  * bounded to the partitions staging touches — `upsertPartitioned`
  * does that with dynamic partition overwrite.
  */
object Upsert {

  /** Pure upsert semantics: rows of `target` not matched by `staging`
    * on `keys`, plus all of `staging`. Equivalent to the reference's
    * generated MERGE (`loaders.py:160-169`). */
  def upsert(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame =
    target.join(broadcast(staging), keys, "left_anti")
      .unionByName(staging.select(target.columns.map(col): _*))

  /** Affected-rows metric, mirroring BigQuery's
    * `num_dml_affected_rows` (`loaders.py:178`): matched (updated) +
    * unmatched (inserted) = staging row count; matched alone is the
    * semi-join count. */
  def affectedRows(target: DataFrame, staging: DataFrame, keys: Seq[String]): (Long, Long) = {
    val matched = target.join(broadcast(staging), keys, "left_semi").count()
    val stagingRows = staging.count()
    (matched, stagingRows - matched)
  }

  /** Scale path: rewrite ONLY the `partitionCol` partitions present in
    * `staging` (dynamic partition overwrite), so a daily increment
    * touches a day's worth of files, not the whole table. */
  def upsertPartitioned(
      spark: SparkSession,
      tablePath: String,
      staging: DataFrame,
      keys: Seq[String],
      partitionCol: String): Unit = {
    val target = spark.read.parquet(tablePath)
    // Restrict the anti-join to touched partitions: untouched partitions
    // are left on disk as-is by dynamic overwrite.
    val touched = staging.select(partitionCol).distinct()
    // localCheckpoint materializes the (bounded) touched slice so the
    // write below doesn't read from the path it overwrites.
    val touchedTarget = target.join(broadcast(touched), Seq(partitionCol), "left_semi")
      .localCheckpoint()
    val merged = upsert(touchedTarget, staging, keys)
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(tablePath)
  }
}
