package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("row_id", LongType, nullable = false),
    StructField("k", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  private val dimSchema = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("attr", LongType, nullable = false)))

  // skewed: 90 rows on "hot", 10 spread across others
  private def fact = df(factSchema,
    ((1 to 90).map(i => Row(i.toLong, "hot", i.toDouble)) ++
      (91 to 100).map(i => Row(i.toLong, s"k${i % 5}", i.toDouble))): _*)

  private def dim = df(dimSchema,
    (Seq(Row("hot", 1L)) ++ (0 until 5).map(i => Row(s"k$i", (i + 10).toLong))): _*)

  test("saltedJoin equals the plain join, for several bucket counts") {
    val plain = fact.join(dim, Seq("k"))
    for (buckets <- Seq(1, 3, 8)) {
      assertSameRows(Skew.saltedJoin(fact, dim, Seq("k"), col("row_id"), buckets), plain)
    }
  }

  test("saltedJoin spreads a hot key across salt sub-keys") {
    val salted = fact.withColumn("__salt", pmod(col("row_id"), lit(8)).cast("int"))
    val spread = salted.filter(col("k") === "hot")
      .select("__salt").distinct().count()
    spread should be > 4L // 90 rows across 8 salts: all buckets in practice
  }

  test("saltedStats equals the direct aggregation") {
    val direct = fact.groupBy(col("k")).agg(
      sum(col("v").cast(DecimalType(38, 4))).cast("double").as("sum_v"),
      count(col("v")).as("count_v"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
    assertSameRows(
      Skew.saltedStats(fact, Seq("k"), "v", col("row_id"), buckets = 8),
      direct)
  }

  test("approximate distinct counts stay within tolerance of exact") {
    val bars = graft.SparkEntry.mergedBars(spark, "/root/testdata/sf0.001")
    val approx = graft.analytics.StockAnalytics.qualityMetricsApprox(bars)
      .select("unique_dates", "unique_symbols", "unique_sources")
      .collect()(0)
    val exact = bars.agg(
      countDistinct(col("date")), countDistinct(col("symbol")),
      countDistinct(col("data_source"))).collect()(0)
    for (i <- 0 until 3) {
      val a = approx.getLong(i).toDouble
      val e = exact.getLong(i).toDouble
      math.abs(a - e) / e should be <= 0.05
    }
  }
}
