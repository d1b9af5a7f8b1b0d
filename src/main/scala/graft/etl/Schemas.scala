package graft.etl

import org.apache.spark.sql.types._

/** Canonical stock-bar schemas, derived from the reference's three
  * redundant declarations (SURVEY.md §1.2): the BigQuery load schema
  * (reference `dags/stock_etl.py:138-148`), the BigQuery DDL
  * (`plugins/helpers/queries.py:2-19`) and the pandera validation
  * schemas (`dags/utils/validators.py:11-61`). One `StructType` per
  * pipeline stage; everything else derives from these.
  */
object Schemas {

  /** Raw Alpha Vantage shape before normalization
    * (reference `dags/utils/extractors.py:43-50`). */
  val rawAlphaVantage: StructType = StructType(Seq(
    StructField("date", StringType, nullable = false),
    StructField("1. open", DoubleType),
    StructField("2. high", DoubleType),
    StructField("3. low", DoubleType),
    StructField("4. close", DoubleType),
    StructField("5. volume", LongType)))

  /** Raw Yahoo Finance shape, with noise columns the pipeline projects
    * away (reference `dags/utils/extractors.py:109-116,135-136`). */
  val rawYahoo: StructType = StructType(Seq(
    StructField("Date", TimestampType, nullable = false),
    StructField("Open", DoubleType),
    StructField("High", DoubleType),
    StructField("Low", DoubleType),
    StructField("Close", DoubleType),
    StructField("Volume", LongType),
    StructField("Dividends", DoubleType),
    StructField("Stock Splits", DoubleType)))

  /** Post-extraction standard shape, both sources
    * (reference `dags/utils/validators.py:11-42`). */
  val extracted: StructType = StructType(Seq(
    StructField("date", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType),
    StructField("data_source", StringType, nullable = false),
    StructField("extracted_at", TimestampType)))

  /** Transformed/merged canonical schema (reference
    * `dags/utils/validators.py:45-61` + `plugins/helpers/queries.py:2-19`).
    * Unlike the reference we keep `date`/`processed_at` typed end-to-end
    * (DateType/TimestampType) instead of round-tripping through strings.
    */
  val transformed: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType),
    StructField("data_source", StringType, nullable = false),
    StructField("processed_at", TimestampType, nullable = false),
    StructField("daily_change_pct", DoubleType),
    StructField("daily_volatility", DoubleType)))

  /** Dedup/MERGE key (reference `dags/utils/transformers.py:109`,
    * `dags/utils/loaders.py:112,163`). */
  val mergeKey: Seq[String] = Seq("date", "symbol", "data_source")
}

/** Typed row for the canonical merged table. */
case class StockBar(
    date: java.sql.Date,
    symbol: String,
    open: Option[Double],
    high: Option[Double],
    low: Option[Double],
    close: Double,
    volume: Option[Long],
    data_source: String,
    processed_at: java.sql.Timestamp,
    daily_change_pct: Option[Double],
    daily_volatility: Option[Double])
