package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic ingest surface (SURVEY.md §2.1 S6, §2.2 K4; reference
  * `plugins/custom_operators/api_gcs.py:13-119`,
  * `dags/utils/loaders.py:256-330`): a caller-supplied fetch callable
  * becomes a DataFrame under an explicit schema, and loads report the
  * reference's size/count metrics. The network half of a connector is
  * out of engine scope; these are the dataflow halves.
  */
object Ingest {

  /** S6: `fetch_callable → DataFrame` under a declared schema. The
    * fetch runs on the driver (it is an API call, not data-parallel
    * work); everything downstream is a distributed plan. */
  def fromCallable(spark: SparkSession, fetch: () => Seq[Row],
                   schema: StructType): DataFrame = {
    val rows = fetch()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, math.min(rows.size, 8))),
      schema)
  }

  /** K4 result shape, mirroring the reference's upload metrics
    * (`loaders.py:312-320`: size, count, destination). */
  case class LoadResult(rows: Long, bytes: Long, path: String)

  /** K4: write to any Hadoop-FS URI (file://, hdfs://, s3a://, gs://
    * — scheme-agnostic by construction) and report load metrics. The
    * reference's local→bucket staging hop disappears: Spark writes
    * straight to the destination. The row count rides the write job as
    * an observed metric — no second scan of what was just written
    * (at 100 TB the old read-back count doubled the job's IO). */
  def uploadParquet(df: DataFrame, uri: String): LoadResult = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(uri)
    val rows = obs.get("rows").asInstanceOf[Long]
    val spark = df.sparkSession
    val p = new Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    LoadResult(rows, bytes, uri)
  }
}
