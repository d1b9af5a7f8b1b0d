package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private val cfgJson = """{
    "stock_etl_config": {
      "stock_symbols": ["AAA", "BBB"],
      "backfill_days": 30,
      "data_freshness_threshold_hours": 24
    },
    "etl_monitoring": {
      "enable_alerts": true,
      "error_threshold": 5,
      "data_volume_threshold_mb": 1.5,
      "quality_score_threshold": 0.95
    },
    "environment": "test"
  }"""

  private val rawSchema = StructType(Seq(
    StructField("date", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = true),
    StructField("data_source", StringType, nullable = false),
    StructField("extracted_at", TimestampType, nullable = false)))

  private val t0 = Timestamp.valueOf("2024-01-06 06:00:00")

  private def bar(date: String, sym: String, close: Double, src: String) =
    Row(date, sym, close - 1, close + 1, close - 2, close, 100L, src, t0)

  private def source(src: String, rows: Row*) = df(rawSchema, rows: _*)

  test("config loader parses the reference variables.json shape") {
    val cfg = PipelineConfig.fromJson(cfgJson)
    cfg.stock_etl_config.stock_symbols shouldBe Seq("AAA", "BBB")
    cfg.stock_etl_config.backfill_days shouldBe 30
    cfg.etl_monitoring.quality_score_threshold shouldBe 0.95
    cfg.environment shouldBe "test"
  }

  test("end-to-end run: gates pass, dedup keeps first source, table written") {
    val cfg = PipelineConfig.fromJson(cfgJson)
    val av = source("alpha_vantage",
      bar("2024-01-05", "AAA", 100.0, "alpha_vantage"),
      bar("2024-01-05", "BBB", 50.0, "alpha_vantage"))
    val yh = source("yahoo_finance",
      bar("2024-01-05", "AAA", 100.5, "yahoo_finance"),
      bar("2024-01-05", "BBB", 50.5, "yahoo_finance"))
    val table = Files.createTempDirectory("graft-pipe").resolve("bars").toString
    val res = Pipeline.run(spark, Seq(av, yh), cfg, table,
      today = lit("2024-01-06").cast("date"))
    res.passed shouldBe true
    res.rowsWritten shouldBe 4L // distinct (date,symbol,data_source)
    res.reports.map(_.stage) should contain allOf
      ("validate_raw_0", "validate_transformed", "validate_coverage", "validate_freshness")
    // month-partitioned layout on disk
    new java.io.File(table).listFiles().map(_.getName) should contain("month=2024-01")
  }

  test("raw validation failure aborts the pipeline (negative close)") {
    val cfg = PipelineConfig.fromJson(cfgJson)
    val bad = source("alpha_vantage", bar("2024-01-05", "AAA", -5.0, "alpha_vantage"))
    val table = Files.createTempDirectory("graft-pipe").resolve("bars").toString
    an[IllegalArgumentException] should be thrownBy
      Pipeline.run(spark, Seq(bad), cfg, table, today = lit("2024-01-06").cast("date"))
  }

  test("q306 wires the full README DAG: view-after-upsert equals the piecewise composition (README.md:96-131)") {
    // The registry's end-to-end entry runs extract -> validate raw ->
    // transform -> merge -> validate transformed -> partitioned upload
    // -> MERGE load -> daily-metrics view as ONE run; this pins that
    // its output is exactly the piecewise composition of the already-
    // oracled pieces: q03's daily metrics over q08's logical upsert.
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q306_pipeline_e2e")(spark, dir)
    val merged = graft.SparkEntry.mergedBars(spark, dir)
    val target = merged.filter(col("date") < lit("1999-01-01").cast("date"))
    val staging = merged
      .filter(col("date") >= lit("1998-06-01").cast("date") &&
        col("date") < lit("1999-01-01").cast("date"))
      .withColumn("close", col("close") + 1.0)
      .select(merged.columns.map(col): _*)
    val after = graft.etl.Upsert.upsert(target, staging,
      graft.etl.Schemas.mergeKey)
    val twin = graft.analytics.StockAnalytics.dailyMetrics(after,
      pick = min(_), avgF = graft.core.Exact.exactAvg(_, 4))
    assertSameRows(out, twin)
  }

  test("coverage and freshness issues report without aborting") {
    val cfg = PipelineConfig.fromJson(cfgJson)
    val av = source("alpha_vantage", bar("2024-01-05", "AAA", 100.0, "alpha_vantage"))
    val table = Files.createTempDirectory("graft-pipe").resolve("bars").toString
    // BBB missing; data 10 days older than `today` -> both gates report
    val res = Pipeline.run(spark, Seq(av), cfg, table,
      today = lit("2024-01-15").cast("date"))
    res.passed shouldBe false
    val by = res.reports.map(r => r.stage -> r.result).toMap
    by("validate_coverage").passed shouldBe false
    by("validate_freshness").passed shouldBe false
    by("validate_transformed").passed shouldBe true
  }
}
