package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-based MERGE upsert (SURVEY.md §2.2 K7, reference
  * `dags/utils/loaders.py:107-190`): WHEN MATCHED → take the staging
  * row (update all non-key columns), WHEN NOT MATCHED → insert.
  *
  * Spark-on-Parquet has no in-place MERGE, so the upsert is
  *   target ⟕anti staging  ∪  staging
  * The broadcast decision is left to AQE by default: a daily increment
  * gets broadcast automatically, while a large backfill staging set
  * falls back to a shuffled join instead of OOMing the driver. Callers
  * that KNOW staging is tiny can force the hint. At 100 TB the rewrite
  * must be bounded to the partitions staging touches —
  * `upsertPartitioned` does that with dynamic partition overwrite.
  */
object Upsert {

  /** Pure upsert semantics: rows of `target` not matched by `staging`
    * on `keys`, plus all of `staging`. Equivalent to the reference's
    * generated MERGE (`loaders.py:160-169`). BigQuery MERGE errors on
    * duplicate staging keys; we preserve detectability via
    * [[assertUniqueKeys]] rather than paying the check on every call. */
  def upsert(
      target: DataFrame,
      staging: DataFrame,
      keys: Seq[String],
      broadcastStaging: Boolean = false): DataFrame = {
    val s = if (broadcastStaging) broadcast(staging) else staging
    target.join(s, keys, "left_anti")
      .unionByName(staging.select(target.columns.map(col): _*))
  }

  /** Throws if `staging` carries duplicate keys — the reference's
    * BigQuery MERGE raises in that case; run this gate when the
    * upstream dedup is not already guaranteed. */
  def assertUniqueKeys(staging: DataFrame, keys: Seq[String]): Unit = {
    val dups = staging.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dups == 0, s"staging has duplicate keys on (${keys.mkString(",")})")
  }

  /** Affected-rows metric, mirroring BigQuery's
    * `num_dml_affected_rows` (`loaders.py:178`): matched (updated) +
    * unmatched (inserted) = staging row count; matched alone is the
    * semi-join count. */
  def affectedRows(target: DataFrame, staging: DataFrame, keys: Seq[String]): (Long, Long) = {
    val matched = target.join(staging, keys, "left_semi").count()
    val stagingRows = staging.count()
    (matched, stagingRows - matched)
  }

  /** Scale path: rewrite ONLY the `partitionCol` partitions present in
    * `staging` (dynamic partition overwrite), so a daily increment
    * touches a day's worth of files, not the whole table.
    *
    * The merged slice is first materialized to a temp directory next to
    * the table, then re-read for the overwrite: the overwrite never
    * reads from the path it is deleting, and an executor loss between
    * the two steps cannot lose data (unlike an eager localCheckpoint,
    * whose blocks die with the executor). The temp write is the price
    * of crash-safety on plain Parquet; table formats with a
    * transaction log make it free.
    *
    * Requires the existing table to be partitioned by `partitionCol` —
    * root-level data files would silently survive a dynamic overwrite
    * and duplicate rows, so that layout is rejected. */
  def upsertPartitioned(
      spark: SparkSession,
      tablePath: String,
      staging: DataFrame,
      keys: Seq[String],
      partitionCol: String): Unit = {
    assertPartitionedLayout(spark, tablePath, partitionCol)
    val target = spark.read.parquet(tablePath)
    // Restrict the anti-join to touched partitions: untouched partitions
    // are left on disk as-is by dynamic overwrite. The touched-key set
    // is tiny by construction (distinct partition values of a daily
    // increment) — broadcasting it is safe and prunes the target scan.
    val touched = staging.select(partitionCol).distinct()
    val touchedTarget = target.join(broadcast(touched), Seq(partitionCol), "left_semi")
    val merged = upsert(touchedTarget, staging, keys)

    val tmpPath = s"$tablePath.__upsert_tmp"
    merged.write.mode("overwrite").parquet(tmpPath)
    spark.read.parquet(tmpPath).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(tablePath)
    val fs = new Path(tmpPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(tmpPath), true)
  }

  /** A non-empty table whose root holds data files (instead of
    * `partitionCol=...` directories) is not partitioned as declared. */
  private def assertPartitionedLayout(
      spark: SparkSession, tablePath: String, partitionCol: String): Unit = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val entries = fs.listStatus(p).filterNot { st =>
        val n = st.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      val rogue = entries.filterNot(st =>
        st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol="))
      require(rogue.isEmpty,
        s"$tablePath is not partitioned by $partitionCol " +
          s"(found ${rogue.map(_.getPath.getName).take(3).mkString(",")})")
    }
  }
}
