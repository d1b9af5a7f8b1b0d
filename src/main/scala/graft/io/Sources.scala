package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources and sinks (SURVEY.md §2.1 S3/S4/S5, §2.2
  * K1/K2/K3) with the reference's extension-dispatch read (reference
  * `plugins/custom_operators/data_quality.py:63-72`).
  *
  * Schemas are explicit on read: the reference infers
  * (`pd.read_csv` with no dtypes) and coerces later; distributed
  * inference is an extra full pass over the data and produces
  * nondeterministic widths — an engine at 100 TB declares its types.
  */
object Sources {

  /** Text sinks default to millisecond timestamps — a lossy
    * round-trip. Pin microsecond precision (TimestampType's full
    * resolution) on both sides. */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Extension-dispatched read: `.csv` → header CSV, `.json` →
    * JSON-lines, `.parquet` → parquet. Mirrors the reference's
    * quality-gate reader; unknown extensions fail loudly. */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    def base: DataFrameReader =
      schema.fold(spark.read)(s => spark.read.schema(s))
    // Dispatch on the LAST path segment's extension only: a dotted
    // directory segment (/data/v1.2/out.csv) must not hijack the match.
    val leaf = path.replaceAll("/+$", "").split('/').last
    (if (leaf.contains('.')) Some(leaf.substring(leaf.lastIndexOf('.') + 1))
     else None) match {
      case Some("csv") =>
        base.option("header", true).option("timestampFormat", TsFormat).csv(path)
      case Some("json") | Some("jsonl") =>
        base.option("timestampFormat", TsFormat).json(path)
      case Some("parquet") => base.parquet(path)
      case Some("orc") => base.orc(path)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported file format: ${other.getOrElse("<none>")} ($path)")
    }
  }

  /** K1: header CSV (the reference's `to_csv(index=False)`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true)
      .option("timestampFormat", TsFormat).csv(path)

  /** K2: JSON-lines (the reference's
    * `to_json(orient='records', lines=True)`). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("timestampFormat", TsFormat).json(path)

  /** K3: parquet. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Permissive JSON-lines ingest with malformed-record QUARANTINE —
    * the hygiene layer a crawl/API feed needs: a bad line must neither
    * kill the job (FAILFAST) nor vanish silently (DROPMALFORMED);
    * it lands null-typed with its RAW TEXT preserved in `_malformed`
    * for replay/debugging, and good rows parse against the explicit
    * schema as usual. Wraps Spark's PERMISSIVE mode +
    * columnNameOfCorruptRecord; the quarantine column is appended to
    * the caller's schema here so callers keep declaring only their
    * data columns. (Spark refuses plans referencing ONLY the corrupt
    * column over raw JSON — callers projecting just the quarantine
    * should select a data column alongside, as the q136 split does.) */
  def readJsonQuarantine(spark: SparkSession, path: String,
                         schema: StructType,
                         quarantineCol: String = "_malformed"): DataFrame =
    spark.read
      .schema(schema.add(quarantineCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** ORC — the other columnar format large warehouses standardize on
    * (Hive/Trino estates); Spark bundles native vectorized ORC. Same
    * lossless native-type round-trip contract as parquet (micros
    * timestamps, binary doubles — no text formatting involved). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** CSV twin of [[readJsonQuarantine]] — the same
    * neither-kill-nor-drop contract for delimited feeds (the format
    * partner exports actually send): rows whose parse fails against
    * the explicit schema (wrong arity, bad cast) land null-typed with
    * the RAW LINE preserved in the quarantine column; good rows parse
    * as usual. PERMISSIVE + columnNameOfCorruptRecord under the hood;
    * the caller declares only data columns. CSV semantics vs JSON,
    * pinned in the spec: ANY arity mismatch — short row, long row —
    * and any type-cast failure quarantines (Spark's CSV parser treats
    * both as malformed), where JSON tolerates absent fields as nulls;
    * feeds with legitimately-optional trailing fields belong in JSON
    * or need a padded schema. PRUNING CAVEAT (measured, q252): under
    * CSV column pruning the parser only parses the columns the plan
    * reads, and corruption is only detected among THOSE — a query
    * projecting one column out of five will miss arity/cast faults in
    * the rest. A quarantine verdict that must reflect the whole row
    * has to keep every schema column live in the plan (q252 does it
    * with a min() probe on the otherwise-unused key). */
  def readCsvQuarantine(spark: SparkSession, path: String,
                        schema: StructType,
                        quarantineCol: String = "_malformed"): DataFrame =
    spark.read
      .schema(schema.add(quarantineCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .option("header", "false")
      .option("timestampFormat", TsFormat)
      .csv(path)
}
