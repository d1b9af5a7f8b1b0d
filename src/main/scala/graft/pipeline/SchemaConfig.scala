package graft.pipeline

import org.apache.spark.sql.types._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.JsonMethods

/** Schema-from-config builder (SURVEY.md §2.11, reference
  * `dags/utils/loaders.py:83-104`): the reference turns a list of
  * `{name, type, mode}` dicts into BigQuery SchemaFields; here the
  * same declaration shape becomes a Spark `StructType`, so ingest
  * contracts live in config, not code. */
object SchemaConfig {

  case class FieldSpec(name: String, `type`: String, mode: Option[String])

  implicit private val formats: Formats = DefaultFormats

  /** BigQuery-style type names → Spark types (SURVEY.md §1.3 table). */
  def sparkType(t: String): DataType = t.toUpperCase match {
    case "STRING" => StringType
    case "FLOAT" | "FLOAT64" | "DOUBLE" => DoubleType
    case "INTEGER" | "INT64" | "LONG" => LongType
    case "DATE" => DateType
    case "TIMESTAMP" => TimestampType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "BYTES" | "BINARY" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  def fromSpecs(specs: Seq[FieldSpec]): StructType =
    StructType(specs.map(f => StructField(f.name, sparkType(f.`type`),
      nullable = !f.mode.map(_.toUpperCase).contains("REQUIRED"))))

  /** JSON array of `{"name": ..., "type": ..., "mode": ...}`. */
  def fromJson(json: String): StructType =
    fromSpecs(JsonMethods.parse(json).extract[Seq[FieldSpec]])
}
