package graft.pipeline

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SchemaConfigSpec extends AnyFunSuite with Matchers {

  test("BigQuery-style field specs become a StructType") {
    val json = """[
      {"name": "date", "type": "DATE", "mode": "REQUIRED"},
      {"name": "symbol", "type": "STRING", "mode": "REQUIRED"},
      {"name": "close", "type": "FLOAT", "mode": "REQUIRED"},
      {"name": "volume", "type": "INTEGER", "mode": "NULLABLE"},
      {"name": "processed_at", "type": "TIMESTAMP"}
    ]"""
    SchemaConfig.fromJson(json) shouldBe StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("symbol", StringType, nullable = false),
      StructField("close", DoubleType, nullable = false),
      StructField("volume", LongType, nullable = true),
      StructField("processed_at", TimestampType, nullable = true)))
  }

  test("unknown types fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      SchemaConfig.fromJson("""[{"name": "x", "type": "GEOGRAPHY"}]""")
  }
}
