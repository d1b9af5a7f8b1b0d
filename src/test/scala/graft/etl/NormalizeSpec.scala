package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mirrors the reference's extractor fixtures
  * (`tests/extractors.py:22-42`): raw Alpha Vantage columns
  * `1. open`..`5. volume`, raw Yahoo capitalized columns plus
  * Dividends / Stock Splits noise. */
class NormalizeSpec extends SparkSpec {

  test("alpha vantage raw shape normalizes to the standard contract (S1)") {
    val raw = df(Schemas.rawAlphaVantage,
      Row("2024-03-01", 10.0, 12.0, 9.0, 11.0, 1000L),
      Row("2024-03-02", 11.0, 13.0, 10.0, 12.0, 1100L))
    val out = Normalize.alphaVantage(raw, symbol = "AAPL")
    out.columns shouldBe Normalize.standardColumns
    val r = out.orderBy("date").collect()(0)
    r.getAs[String]("symbol") shouldBe "AAPL"
    r.getAs[String]("data_source") shouldBe "alpha_vantage"
    r.getAs[Double]("open") shouldBe 10.0
    r.getAs[String]("date") shouldBe "2024-03-01"
  }

  test("yahoo raw shape drops noise columns via keep-list (S2/P2)") {
    val raw = df(Schemas.rawYahoo,
      Row(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
        10.0, 12.0, 9.0, 11.0, 1000L, 0.5, 0.0))
    val out = Normalize.yahooFinance(raw, symbol = "MSFT")
    out.columns should not contain "Dividends"
    out.columns should not contain "Stock Splits"
    out.columns shouldBe Normalize.standardColumns
    out.collect()(0).getAs[String]("data_source") shouldBe "yahoo_finance"
  }

  test("per-source error isolation: failures collected, all-fail is fatal (S6)") {
    val ok = () => df(Schemas.rawAlphaVantage, Row("2024-03-01", 1.0, 2.0, 1.0, 2.0, 10L))
    val boom = () => throw new RuntimeException("api down")
    val (merged, errs) = Normalize.unionWithIsolation(Seq(ok, boom))
    merged.count() shouldBe 1
    errs should have size 1
    an[IllegalArgumentException] should be thrownBy
      Normalize.unionWithIsolation(Seq(boom, boom))
  }
}
