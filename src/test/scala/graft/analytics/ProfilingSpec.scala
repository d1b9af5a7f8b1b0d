package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def lineitem = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx percentiles land within the rank-error band of the exact ones") {
    val ps = Seq(0.5, 0.9, 0.95)
    val eps = 0.02 // looser than the sketch's 1/accuracy guarantee
    val approx = Profiling.approxPercentiles(lineitem, "l_quantity",
      "l_returnflag", ps, accuracy = 10000)
      .collect().map(r => r.getString(0) ->
        ps.map(p => r.getAs[Double](s"p${(p * 100).toInt}"))).toMap
    // exact rank-band bounds: value at rank p-eps and p+eps
    val lo = ps.map(p => math.max(0.0, p - eps))
    val hi = ps.map(p => math.min(1.0, p + eps))
    def exact(qs: Seq[Double]) = lineitem
      .groupBy("l_returnflag")
      .agg(expr(s"percentile(l_quantity, array(${qs.mkString(",")}))").as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exLo = exact(lo); val exHi = exact(hi)
    approx.foreach { case (flag, vals) =>
      vals.indices.foreach { i =>
        vals(i) should be >= exLo(flag)(i)
        vals(i) should be <= exHi(flag)(i)
      }
    }
  }

  test("histogram bins partition the value range; counts sum to rows") {
    val h = Profiling.histogram(lineitem, "l_quantity", binWidth = 10.0)
      .collect()
    h.map(_.getAs[Long]("n")).sum shouldBe lineitem
      .filter(col("l_quantity").isNotNull).count()
    h.foreach { r =>
      val lo = r.getAs[Double]("bin_lo")
      r.getAs[Double]("bin_min") should be >= lo
      r.getAs[Double]("bin_max") should be < lo + 10.0
    }
  }
}
