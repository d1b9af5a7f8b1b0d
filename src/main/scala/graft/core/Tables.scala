package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness tables (TESTDATA.md). One parquet file per
  * table under the scale-factor directory. At cluster scale these would
  * be partitioned table roots; the API is the same either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The events table's `ts` physical type has drifted across harness
    * generations, so normalize every variant to TimestampType here —
    * downstream operators (sessionize's unix_micros, the range join)
    * assume it:
    *  - TIMESTAMP(NANOS) parquet: Spark's TimestampType (micros)
    *    refuses it outright; read nanos as long and truncate to
    *    micros — the same truncation DuckDB's epoch_us applies, so
    *    both engines see identical instants;
    *  - timezone-less timestamp[us] parquet: Spark 4 reads it as
    *    TIMESTAMP_NTZ; cast to TimestampType, an identity instant
    *    under the pinned UTC session zone (oracle hashes unchanged);
    *  - plain TIMESTAMP: passes through untouched. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
