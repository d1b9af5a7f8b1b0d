package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout audit of a parquet table — the small-files problem
  * detector every large table needs watched: a 100 TB table written
  * by too-parallel jobs degenerates into millions of KB-sized files,
  * and then EVERY read pays per-file open/footer/scheduling overhead
  * that dwarfs the IO (the reason compaction exists — see
  * [[Compaction]], whose effect this audit measures before/after).
  *
  * Built on Spark's `_metadata` hidden column: file identity and size
  * come from the scan itself — no driver-side filesystem walk, no
  * listing race against concurrent writers, and row counts and file
  * stats land in ONE distributed pass over the table (the listing a
  * `FileSystem.listStatus` loop would do on the driver is exactly
  * what breaks at millions of files).
  *
  * Spec-verified, not oracled: `_metadata` is Spark's own scan
  * surface — DuckDB sees different absolute paths and no equivalent
  * column — so the suite pins it against tables written with
  * controlled `maxRecordsPerFile` rolling and against [[Compaction]]
  * (the E125/E65 fixtures). */
object FileAudit {

  /** Per-file profile: (file_path, file_bytes, n_rows). One
    * distributed aggregate keyed on the file — output is bounded by
    * the file count. */
  def fileProfile(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.file_size").as("file_bytes"))
      .groupBy(col("file_path"), col("file_bytes"))
      .agg(count(lit(1)).as("n_rows"))

  /** One-row table summary against a target file size: file/row/byte
    * totals, the count and byte-share of files under HALF the target
    * (the standard "small file" line — a file near the target is
    * fine, one far under it is overhead), and min/median/max file
    * bytes. `small_share_permille` over FILES is the compaction
    * trigger signal: high share = schedule a [[Compaction]] pass. */
  def smallFilesReport(spark: SparkSession, path: String,
                       targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = fileProfile(spark, path)
    files.agg(
        count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("file_bytes")).as("total_bytes"),
        count(when(col("file_bytes") < targetBytes / 2, 1)).as("n_small_files"),
        sum(when(col("file_bytes") < targetBytes / 2, col("file_bytes"))
          .otherwise(0L)).as("small_bytes"),
        min(col("file_bytes")).as("min_file_bytes"),
        expr("percentile(file_bytes, 0.5)").as("median_file_bytes"),
        max(col("file_bytes")).as("max_file_bytes"))
      .withColumn("small_share_permille",
        expr("(n_small_files * 1000) div n_files"))
      .withColumn("target_bytes", lit(targetBytes))
  }
}
