package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def lineitem = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("weightedMedian: weight mass decides, not row counts") {
    import spark.implicits._
    // five rows of value 1 at weight 1 vs one row of value 100 at
    // weight 50: the plain median says 1, the weighted median 100
    val d = ((1 to 5).map(_ => ("g", 1L, 1L)) :+ (("g", 100L, 50L)))
      .toDF("g", "v", "w")
    val out = Profiling.weightedMedian(d, Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect()
    out.toSeq shouldBe Seq(("g", 100L, 55L, 6L))
  }

  test("weightedMedian: unit weights reduce to the lower median; crossing is exact") {
    import spark.implicits._
    val d = Seq(("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 1L), ("a", 40L, 1L),
      ("b", 5L, 2L), ("b", 7L, 2L), ("b", 9L, 1L))
      .toDF("g", "v", "w")
    val out = Profiling.weightedMedian(d, Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out("a") shouldBe (("a", 20L, 4L, 4L))  // (4+1) div 2 = 2 -> 2nd value
    out("b") shouldBe (("b", 7L, 5L, 3L))   // th 3: cum 2 -> 4 crosses at 7
  }

  test("weightedMedian is invariant under input partitioning (with value ties)") {
    import spark.implicits._
    val d = (1 to 120).map(i => (s"g${i % 3}", i % 10L, i % 4L + 1))
      .toDF("g", "v", "w")
    assertSameRows(Profiling.weightedMedian(d, Seq("g"), "v", "w"),
      Profiling.weightedMedian(d.repartition(7), Seq("g"), "v", "w"))
  }

  test("fdDiscovery: derived column holds, inverse fails, counts exact") {
    // b = a % 2 -> a determines b; b can't determine a (2 values, 6 keys)
    val d = (1 to 60).map(i => (i % 6, i % 6 % 2, s"t${i % 3}"))
      .toDF("a", "b", "t")
    val out = Profiling.fdDiscovery(d, Seq("a", "b", "t"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    out.size shouldBe 6
    out(("a", "b")) shouldBe ((6L, 6L, true))
    out(("b", "a")) shouldBe ((2L, 6L, false))
    out(("a", "t")) shouldBe ((6L, 6L, true))   // i%6 -> i%3 (divisor)
    out(("t", "a")) shouldBe ((3L, 6L, false))
    out(("b", "t")) shouldBe ((2L, 6L, false))  // parity can't fix i%3
    out(("t", "b")) shouldBe ((3L, 6L, false))
  }

  test("fdDiscovery: rows with NULL in either column are excluded from that pair") {
    val d = Seq(
      (Some(1), Some(10)), (Some(1), None), (Some(2), Some(20)),
      (None, Some(30)))
      .toDF("a", "b")
    val out = Profiling.fdDiscovery(d, Seq("a", "b"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // pair counts see only (1,10) and (2,20); n_det counts all non-null a
    out(("a", "b")) shouldBe ((2L, 2L, true))
    out(("b", "a")) shouldBe ((3L, 2L, false)) // 3 distinct b, 2 full pairs
  }

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

  test("madOutliers: hand-computed median/MAD fence; masking-resistant") {
    import spark.implicits._
    // group a: median 3, deviations [2,1,0,1,97], MAD 1, fence 3 -> the
    // 100 is the only row beyond it. A mean/stddev fence would be
    // dragged to ~43 by the same outlier (the masking this resists).
    // group b: constant series -> MAD 0, strict > keeps outliers at 0.
    val d = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map("a" -> _) ++
      Seq(7.0, 7.0, 7.0).map("b" -> _)).toDF("g", "v")
    val out = Profiling.madOutliers(d, "g", "v", k = 3.0)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    out("a") shouldBe (("a", 5L, 3.0, 1.0, 1L))
    out("b") shouldBe (("b", 3L, 7.0, 0.0, 0L))
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

  test("winsorizedStats clips to exact group percentiles") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    // group A: 1..100 -> p05 = 5.95, p95 = 95.05 (percentile_cont)
    val d = df(schema, (1 to 100).map(i => Row("A", i.toDouble)): _*)
    val out = Profiling.winsorizedStats(d, "g", "v")
      .select("g", "n", "n_clipped_low", "n_clipped_high", "lo", "hi",
        "sum_raw", "sum_winsor").collect().head
    out.getLong(1) shouldBe 100L
    out.getLong(2) shouldBe 5L  // 1..5 below 5.95
    out.getLong(3) shouldBe 5L  // 96..100 above 95.05
    out.getDouble(4) shouldBe 5.95 +- 1e-9
    out.getDouble(5) shouldBe 95.05 +- 1e-9
    out.getDouble(6) shouldBe 5050.0
    // clipped sum: (1..5 -> 5.95)x5 and (96..100 -> 95.05)x5
    val expected = 5050.0 - (1 to 5).sum - (96 to 100).sum + 5 * 5.95 + 5 * 95.05
    out.getDouble(7) shouldBe expected +- 1e-6
  }

  test("categoricalDrift: TV distance is 0 for identical, 1 for disjoint") {
    val a = Seq("x", "x", "y").toDF("k")
    Profiling.driftScore(a, a, "k") shouldBe 0.0
    val b = Seq("z", "z", "w").toDF("k")
    Profiling.driftScore(a, b, "k") shouldBe 1.0
  }

  test("categoricalDrift reports one-sided categories with zero counts") {
    val base = Seq("x", "x", "y", "y").toDF("k")    // x .5, y .5
    val in = Seq("x", "x", "x", "z").toDF("k")      // x .75, z .25
    val out = Profiling.categoricalDrift(base, in, "k")
      .orderBy("k")
      .select("k", "n_base", "n_in", "abs_cross", "share_diff")
      .as[(String, Long, Long, Long, Double)].collect()
    out shouldBe Array(
      ("x", 2L, 3L, 4L, 0.25),   // |2*4 - 3*4| / 16
      ("y", 2L, 0L, 8L, 0.5),
      ("z", 0L, 1L, 4L, 0.25))
    // TV = (0.25 + 0.5 + 0.25) / 2
    Profiling.driftScore(base, in, "k") shouldBe 0.5
  }

  test("categoricalDrift treats NULL as one category on both sides") {
    // null appears in BOTH snapshots: the null-safe join must meet
    // them in ONE row (share .5 vs .5, zero drift), not two phantom
    // one-sided rows that would each contribute 0.5 to the score.
    val base = Seq(Some("x"), None, None, Some("x")).toDF("k")
    val in = Seq(None, Some("x")).toDF("k")
    val out = Profiling.categoricalDrift(base, in, "k")
      .select("k", "n_base", "n_in", "share_diff")
      .as[(Option[String], Long, Long, Double)].collect()
      .sortBy(_._1)
    out shouldBe Array(
      (None, 2L, 1L, 0.0),
      (Some("x"), 2L, 1L, 0.0))
    Profiling.driftScore(base, in, "k") shouldBe 0.0
  }

  test("ksDrift finds the max CDF gap and where it peaks") {
    val base = Seq(1.0, 2.0, 3.0).toDF("v")      // F_a steps 1/3 each
    val in = Seq(3.0, 4.0).toDF("v")             // F_b starts at 3
    val out = Profiling.ksDrift(base, in, "v")
      .select("at_value", "ks_parts", "n_base", "n_in", "ks")
      .as[(Double, Long, Long, Long, Double)].collect()
    // gap peaks after v=2: |F_a - F_b| = |2/3 - 0| -> parts |2*2-0*3|=4
    out shouldBe Array((2.0, 4L, 3L, 2L, 4.0 / 6.0))
  }

  test("tableStats profiles each column in one pass") {
    val d = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (3L, Some("b")))
      .toDF("id", "s")
    val out = Profiling.tableStats(d, Seq("id", "s"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    out shouldBe Array(
      ("id", 4L, 0L, 3L, Some("1"), Some("3")),
      ("s", 3L, 1L, 2L, Some("a"), Some("b")))
  }

  test("tableStatsApprox: same shape within HLL error, and NO Expand in the plan") {
    // exact counts/min/max identical; distinct within the documented
    // rsd (5% default; 3-sigma margin on a small domain is generous)
    val d = spark.range(10000).select(
      col("id"), (col("id") % 100).cast("string").as("s"))
    val exact = Profiling.tableStats(d, Seq("id", "s")).orderBy("column_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    val approx = Profiling.tableStatsApprox(d, Seq("id", "s")).orderBy("column_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    approx.map(_._1).toSeq shouldBe exact.map(_._1).toSeq
    approx.zip(exact).foreach { case (a, e) =>
      a._2 shouldBe e._2 // n_non_null exact
      a._3 shouldBe e._3 // n_null exact
      a._5 shouldBe e._5; a._6 shouldBe e._6 // min/max exact
      math.abs(a._4 - e._4).toDouble / e._4 should be < 0.15
    }
    // THE point of the swap: multiple exact countDistincts expand the
    // scan |cols| ways; the HLL form is one un-expanded pass.
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Expand")
    hasExpand(Profiling.tableStats(d, Seq("id", "s"))) shouldBe true
    hasExpand(Profiling.tableStatsApprox(d, Seq("id", "s"))) shouldBe false
  }

  test("ksDrift is 0 for identical samples") {
    val a = Seq(1.0, 2.0, 2.0, 5.0).toDF("v")
    Profiling.ksDrift(a, a, "v").select("ks").as[Double].collect()(0) shouldBe 0.0
  }

  test("concentration: hand-computed exact Gini, uniform gives zero, invariant to partitioning") {
    // groups a:1, b:3 -> sorted coefficients (2i-n-1) = (-1, +1):
    // num = -1*1 + 1*3 = 2, den = n*total = 8, Gini = 0.25.
    val d = Seq("a", "b", "b", "b").toDF("g")
    val r = Profiling.concentration(d, "g")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    r shouldBe ((2L, 4L, 2L, 8L, 250L, 750L))
    // equal counts -> exact zero, no float residue
    val u = Seq("a", "a", "b", "b", "c", "c").toDF("g")
    Profiling.concentration(u, "g")
      .select("gini_num", "gini_permille").as[(Long, Long)].head() shouldBe ((0L, 0L))
    // pure function of values
    val big = (1L to 500L).map(i => s"g${(i * i) % 23}").toDF("g")
    Profiling.concentration(big, "g").collect() shouldBe
      Profiling.concentration(big.repartition(7), "g").collect()
  }

  test("quantileFeatures: hand-computed buckets and permilles, ties share a rank") {
    val d = Seq((1L, "g", 10L), (2L, "g", 20L), (3L, "g", 20L), (4L, "g", 30L),
      (9L, "solo", 5L)).toDF("id", "grp", "v")
    val out = Profiling.quantileFeatures(d, "grp", "v", k = 2, tieCol = "id")
      .select("id", "bucket", "rank_permille")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 1, 0L),     // rank 1 of 4 -> 0
      (2L, 1, 333L),   // tied rank 2 -> floor(1000/3)
      (3L, 2, 333L),   // same value, SAME permille, ntile split by id
      (4L, 2, 1000L),  // rank 4 -> 1000
      (9L, 1, 0L))     // single-row group normalizes to 0
  }

  test("quantileFeatures: buckets are equal-frequency (±1) and partitioning-invariant") {
    val d = (1L to 103L).map(i => (i, "g", (i * 37) % 101)).toDF("id", "grp", "v")
    val out = Profiling.quantileFeatures(d, "grp", "v", k = 10, tieCol = "id")
    val sizes = out.groupBy("bucket").count().as[(Int, Long)].collect().toMap
    sizes.keys.toSeq.sorted shouldBe (1 to 10)
    sizes.values.max - sizes.values.min should be <= 1L
    // SQL-standard sizing: the first n mod k buckets carry the extra row
    sizes(1) shouldBe 11L
    sizes(10) shouldBe 10L
    assertSameRows(out,
      Profiling.quantileFeatures(d.repartition(7), "grp", "v", 10, "id"))
    // one exchange: the value-only rank window reuses the (value, tie)
    // sort's partitioning
    out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("cubeReport: all four grouping sets from one scan, gid disambiguates") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val d = df(schema,
      Row("en", "s1", 10L), Row("en", "s2", 20L), Row("fr", "s1", 5L))
    val out = Profiling.cubeReport(d, "lang", "source", "n_chars")
      .collect().map(r => (Option(r.getAs[String]("lang")),
        Option(r.getAs[String]("source")), r.getAs[Long]("gid")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("total_value"))).toMap
    out((Some("en"), Some("s1"), 0L)) shouldBe ((1L, 10L))
    out((Some("en"), None, 1L)) shouldBe ((2L, 30L))      // lang marginal
    out((None, Some("s1"), 2L)) shouldBe ((2L, 15L))      // source marginal
    out((None, None, 3L)) shouldBe ((3L, 35L))            // grand total
    out should have size 8 // 3 cells + 2 langs + 2 sources + 1 total
    // single scan: the cube is one Expand, not four unioned aggregates
    val plan = Profiling.cubeReport(d, "lang", "source", "n_chars")
      .queryExecution.executedPlan.toString
    plan.linesIterator.count(_.contains("Expand")) shouldBe 1
    plan should not include "Union"
  }

  test("fdViolations: witnesses only; empty result asserts the FD holds") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType)))
    val d = df(schema, Row("x", "1"), Row("x", "1"), Row("x", "2"),
      Row("y", "3"), Row("y", "3"))
    val out = Profiling.fdViolations(d, "a", "b").collect()
      .map(r => r.getAs[String]("a") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_dependents"))).toMap
    out shouldBe Map("x" -> ((3L, 2L))) // y determines b: not a witness
    // a true FD produces the empty frame — the assertion form
    Profiling.fdViolations(d.filter(col("a") === "y"), "a", "b")
      .count() shouldBe 0L
  }

  test("benfordAudit: decimal-string digits, exclusions, expected table") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", DoubleType, nullable = true)))
    val d = df(schema, Row(1.5), Row(19.0), Row(100.0), Row(2.5), Row(9000.0),
      Row(0.5), Row(null), Row(-12.0)) // 0.5 and null excluded; -12 -> digit 1
    val out = Profiling.benfordAudit(d, "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Long]("observed_permille"),
         r.getAs[Long]("benford_permille"))).toMap
    out(1) shouldBe ((4L, 666L, 301L))
    out(2) shouldBe ((1L, 166L, 176L))
    out(9) shouldBe ((1L, 166L, 46L))
    out.keySet shouldBe Set(1, 2, 9)
  }

  test("lorenzCurve: cumulative shares per distinct size, exact permille") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType)))
    // sizes: a=1, b=1, c=2, d=4 -> points at 1, 2, 4; ng=4, nr=8
    val d = df(schema, (Seq("a", "b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).map(Row(_)): _*)
    val out = Profiling.lorenzCurve(d, "g").collect()
      .map(r => r.getAs[Long]("size") ->
        (r.getAs[Long]("cum_groups"), r.getAs[Long]("cum_rows"),
         r.getAs[Long]("cum_groups_permille"), r.getAs[Long]("cum_rows_permille")))
      .toMap
    out(1L) shouldBe ((2L, 2L, 500L, 250L))
    out(2L) shouldBe ((3L, 4L, 750L, 500L))
    out(4L) shouldBe ((4L, 8L, 1000L, 1000L))
    // uniform distribution: one point, both shares 1000 (the diagonal)
    val u = df(schema, Seq("x", "x", "y", "y").map(Row(_)): _*)
    val up = Profiling.lorenzCurve(u, "g").collect()
    up should have length 1
    up.head.getAs[Long]("cum_groups_permille") shouldBe 1000L
    up.head.getAs[Long]("cum_rows_permille") shouldBe 1000L
  }

  test("pivotMatrix: explicit universe fixes schema; absent cells are 0") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("lang", StringType)))
    val d = df(schema, Row("s1", "en"), Row("s1", "en"), Row("s1", "fr"),
      Row("s2", "en"))
    val out = Profiling.pivotMatrix(d, "source", "lang",
      Seq("en", "fr", "zh"))
    out.columns.toSeq shouldBe Seq("source", "en", "fr", "zh")
    val m = out.collect().map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("en"), r.getAs[Long]("fr"), r.getAs[Long]("zh"))).toMap
    m("s1") shouldBe ((2L, 1L, 0L))
    m("s2") shouldBe ((1L, 0L, 0L)) // fr, zh absent -> 0, never NULL
    assertSameRows(out, Profiling.pivotMatrix(d.repartition(5), "source",
      "lang", Seq("en", "fr", "zh")))
  }

  test("qqTable: identical sides are flat zero; a location shift shows at every probe") {
    val base = (1 to 200).map(_.toDouble).toDF("v")
    val same = Profiling.qqTable(base, base, "v", k = 4).collect()
    same.map(_.getLong(0)).sorted.toSeq shouldBe Seq(250L, 500L, 750L)
    all(same.map(_.getDouble(3))) shouldBe 0.0
    // incoming = base + 7: every quantile moves by exactly 7
    val shifted = (1 to 200).map(i => i.toDouble + 7.0).toDF("v")
    val qq = Profiling.qqTable(base, shifted, "v", k = 4).collect()
    all(qq.map(_.getDouble(3))) shouldBe 7.0
    qq.foreach(r => r.getDouble(2) shouldBe r.getDouble(1) + 7.0)
  }

  test("robustScale: hand medians/IQR, zero-IQR degrades to NULL scaled") {
    val d = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 7.0), ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val out = Profiling.robustScale(d, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // group a: med 3, q1 2, q3 4 -> iqr 2; scaled(5) = 1.0
    out(("a", 5.0)) shouldBe ((3.0, 2.0, Some(1.0)))
    out(("a", 1.0)) shouldBe ((3.0, 2.0, Some(-1.0)))
    out(("a", 3.0)) shouldBe ((3.0, 2.0, Some(0.0)))
    // group b: constant -> iqr 0 -> NULL, never a division blow-up
    out(("b", 7.0)) shouldBe ((7.0, 0.0, None))
  }

  test("robustScale is invariant under input partitioning") {
    val d = (1 to 200).map(i => (s"g${i % 3}", (i % 37).toDouble)).toDF("g", "v")
    assertSameRows(Profiling.robustScale(d, "g", "v"),
      Profiling.robustScale(d.repartition(7), "g", "v"))
  }

  // --- global approximate quantile buckets -------------------------

  test("globalQuantileBuckets: near-equal bucket sizes within the rank-error bound") {
    // 1000 distinct values, k=10, accuracy=10000: sketch rank error
    // floor(n/accuracy) = 0 rows -> cutpoints are exact order
    // statistics and every bucket holds 100 +- 1 (the +-1 is the
    // ties-low boundary convention, not sketch error)
    val d = scala.util.Random.shuffle((1 to 1000).toList)
      .map(_.toDouble).toDF("v").repartition(4)
    val out = Profiling.globalQuantileBuckets(d, "v", k = 10)
    val sizes = out.groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.keySet shouldBe (1L to 10L).toSet
    sizes.values.sum shouldBe 1000L
    all(sizes.values) should (be >= 99L and be <= 101L)
    // monotone: a larger value never lands in a smaller bucket
    val byV = out.select("v", "bucket").as[(Double, Long)]
      .collect().sortBy(_._1).map(_._2)
    byV.sliding(2).foreach(p => p(0) should be <= p(1))
  }

  test("globalQuantileBuckets: equal values always share a bucket; ties land low") {
    // 3 fat ties spanning every boundary of k=4: quantile
    // normalization's invariant — equal inputs, equal features
    val d = (List.fill(500)(1.0) ::: List.fill(300)(2.0) :::
      List.fill(200)(3.0)).toDF("v").repartition(3)
    val got = Profiling.globalQuantileBuckets(d, "v", k = 4)
      .groupBy("v").agg(countDistinct("bucket").as("nb"), min("bucket").as("b"))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    all(got.values.map(_._1)) shouldBe 1L // one bucket per value
    // v=1.0 covers quantiles .25/.5 -> cutpoints c1=c2=1.0; ties land
    // LOW so the 1.0s take bucket 1, 2.0s sit above c3=2.0 -> ties-low
    // again, 3.0s above every cutpoint
    got(1.0)._2 shouldBe 1L
    got(2.0)._2 should (be >= 2L and be <= 3L)
    got(3.0)._2 shouldBe 4L
  }

  test("globalQuantileBuckets: NULLs pass through with NULL bucket") {
    val d = Seq(Some(1.0), None, Some(2.0), Some(3.0), None).toDF("v")
    val out = Profiling.globalQuantileBuckets(d, "v", k = 2).collect()
    out.length shouldBe 5
    out.count(_.isNullAt(1)) shouldBe 2
    out.filter(!_.isNullAt(0)).foreach(r => r.isNullAt(1) shouldBe false)
  }

  test("globalQuantileBuckets plan: bounded sketch aggregate, NO global sort") {
    val d = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profiling.globalQuantileBuckets(d, "v", k = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the 100 TB contract: the only aggregation is the bounded-state
    // percentile sketch, the cutpoints come back as a broadcast, and
    // NOTHING sorts — vs the exact global-ntile alternative, whose
    // window pass needs a single-partition sort of the entire corpus
    plan should include("ObjectHashAggregate")
    plan should not include "Sort ["
    val exactNtile = d.withColumn("bucket",
      ntile(5).over(org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
    exactNtile.collect()
    exactNtile.queryExecution.executedPlan.toString should
      include("SinglePartition")
  }

  test("quantileNormalize: equal sizes take the floor-mean of same-rank order stats") {
    import spark.implicits._
    val d = Seq(("A", 1L, 2L), ("A", 2L, 4L), ("A", 3L, 6L),
        ("B", 4L, 1L), ("B", 5L, 2L), ("B", 6L, 3L))
      .toDF("g", "id", "v")
    val out = Profiling.quantileNormalize(d, "g", "id", "v")
      .select("id", "qn_v").as[(Long, Long)].collect().toMap
    // rank means: (2+1)/2=1, (4+2)/2=3, (6+3)/2=4 (floor 4.5)
    out shouldBe Map(1L -> 1L, 2L -> 3L, 3L -> 4L,
      4L -> 1L, 5L -> 3L, 6L -> 4L)
    // the contract: after QN both groups carry the SAME multiset
    val byG = Profiling.quantileNormalize(d, "g", "id", "v")
      .select("g", "qn_v").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    byG("A") shouldBe byG("B")
  }

  test("quantileNormalize: unequal sizes use the nearest-rank-above lookup") {
    import spark.implicits._
    val d = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 3L, 30L),
        ("A", 4L, 40L), ("B", 5L, 100L), ("B", 6L, 200L))
      .toDF("g", "id", "v")
    val out = Profiling.quantileNormalize(d, "g", "id", "v")
      .select("id", "qn_v").as[(Long, Long)].collect().toMap
    // A ranks 1..4 look up B at ceil(i*2/4) = 1,1,2,2 -> 100,100,200,200
    // B ranks 1..2 look up A at ceil(i*4/2) = 2,4 -> 20,40
    out shouldBe Map(
      1L -> 55L, 2L -> 60L, 3L -> 115L, 4L -> 120L,
      5L -> 60L, 6L -> 120L)
  }

  test("quantileNormalize is invariant under input partitioning") {
    import spark.implicits._
    val d = (1 to 90).map(i => (s"g${i % 3}", i.toLong, (i * 37 % 101).toLong))
      .toDF("g", "id", "v")
    assertSameRows(
      Profiling.quantileNormalize(d, "g", "id", "v"),
      Profiling.quantileNormalize(d.repartition(7), "g", "id", "v"))
  }

  test("candidateKeys: uniqueness and minimality verdicts; nulls count as values") {
    import spark.implicits._
    val d = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 10L))
      .toDF("id", "cat", "v")
    val out = Profiling.candidateKeys(d, Seq("id", "cat", "v"))
      .select("col_a", "col_b", "n_distinct", "is_unique", "is_minimal")
      .as[(String, Option[String], Long, Boolean, Boolean)]
      .collect().map(r => (r._1, r._2.getOrElse("-")) -> ((r._3, r._4, r._5)))
      .toMap
    out(("id", "-")) shouldBe ((3L, true, true))
    out(("cat", "-")) shouldBe ((2L, false, false))
    out(("v", "-")) shouldBe ((2L, false, false))
    out(("id", "cat")) shouldBe ((3L, true, false)) // redundant: id alone
    out(("id", "v")) shouldBe ((3L, true, false))
    out(("cat", "v")) shouldBe ((3L, true, true))   // the minimal pair key
    // nulls are key-relevant values, not skipped rows
    val withNull = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("id", "c")
    val nd = Profiling.candidateKeys(withNull, Seq("id", "c"))
      .filter(col("col_a") === "c" && col("arity") === 1)
      .select("n_distinct").as[Long].head()
    nd shouldBe 2L
  }

  test("inclusionDiscovery: exact INDs by hand, violations kill pairs, NULLs ignored") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L, 4L).toDF("k")
    val child = Seq(Some(2L), Some(3L), None).toDF("k")   // NULL ignored
    val rogue = Seq(2L, 99L).toDF("k")                     // 99 violates
    val out = Profiling.inclusionDiscovery(Seq(
        ("parent", parent, "k"), ("child", child, "k"), ("rogue", rogue, "k")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_child"), r.getAs[Long]("n_parent"))).toSet
    // child ⊆ parent holds; nothing else does (99 breaks rogue ⊆ *,
    // parent ⊄ child, * ⊄ rogue misses most values)
    out shouldBe Set(("child", "parent", 2L, 4L))
  }

  test("inclusionDiscovery: mutual inclusion reports both directions; partition-invariant") {
    import spark.implicits._
    val a = Seq(1L, 2L, 2L).toDF("k")   // duplicates collapse
    val b = Seq(2L, 1L).toDF("k")
    val out = Profiling.inclusionDiscovery(Seq(("a", a, "k"), ("b", b, "k")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    out shouldBe Set(("a", "b"), ("b", "a"))
    val big = (1 to 200).map(i => (i * 3 % 47).toLong).toDF("k")
    val sub = (1 to 50).map(i => (i * 6 % 47).toLong).toDF("k")
    assertSameRows(
      Profiling.inclusionDiscovery(Seq(("big", big, "k"), ("sub", sub, "k"))),
      Profiling.inclusionDiscovery(Seq(("big", big.repartition(7), "k"),
        ("sub", sub.repartition(5), "k"))))
  }

  test("prefixSums matches the single-partition window reference, multi-column") {
    import spark.implicits._
    val d = (1 to 200).map(i => ((i * 17 % 211).toLong, (i % 5).toLong, (i % 3).toLong))
      .toDF("k", "a", "b")   // k unique: 17 coprime to 211
    val ref = d.select(col("k"),
      sum("a").over(org.apache.spark.sql.expressions.Window.orderBy("k")
        .rowsBetween(Long.MinValue, 0)).as("a_cum"),
      sum("b").over(org.apache.spark.sql.expressions.Window.orderBy("k")
        .rowsBetween(Long.MinValue, 0)).as("b_cum"))
    val got = Distributed.prefixSums(d.repartition(7), "k", Seq("a", "b"))
      .select("k", "a_cum", "b_cum")
    assertSameRows(got, ref)
  }

  test("exactQuantiles: hand medians, extremes, duplicates") {
    import spark.implicits._
    // odd n: median of 1..5 at rank ceil(0.5*5)=3 -> 3
    val odd = Seq(5L, 1L, 3L, 2L, 4L).toDF("v")
    val m = Profiling.exactQuantiles(odd, "v", Seq(500, 1000, 1))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    m(500) shouldBe 3L
    m(1000) shouldBe 5L    // q=1000 -> max
    m(1) shouldBe 1L       // tiny q -> min (rank ceil(5/1000)=1)
    // even n: type-1 takes the LOWER middle (rank ceil(0.5*4)=2)
    val even = Seq(10L, 20L, 30L, 40L).toDF("v")
    Profiling.exactQuantiles(even, "v", Seq(500))
      .collect().head.getLong(1) shouldBe 20L
    // heavy duplicates: rank lands inside the run of 7s
    val dup = (Seq.fill(8)(7L) ++ Seq(1L, 100L)).toDF("v")
    Profiling.exactQuantiles(dup, "v", Seq(500))
      .collect().head.getLong(1) shouldBe 7L
  }

  test("exactQuantiles: NULLs excluded; empty input yields no rows") {
    import spark.implicits._
    val d = Seq(Some(1L), None, Some(3L)).toDF("v")
    val r = Profiling.exactQuantiles(d, "v", Seq(1000)).collect().head
    r.getLong(1) shouldBe 3L
    r.getLong(3) shouldBe 2L   // n counts non-null only
    val empty = Seq.empty[Option[Long]].toDF("v")
    Profiling.exactQuantiles(empty, "v", Seq(500)).count() shouldBe 0L
  }

  test("melt: wide metrics become (id, metric, value) rows; NULL cells are kept") {
    import spark.implicits._
    val wide = Seq((1L, Some(10L), Some(20L)), (2L, None, Some(30L)))
      .toDF("id", "a", "b")
    val long = Profiling.melt(wide, Seq("id"), Seq("a", "b"))
    long.count() shouldBe 4L    // 2 rows x 2 metrics, null cell included
    long.filter(col("id") === 2L && col("metric") === "a")
      .select("value").collect().head.isNullAt(0) shouldBe true
    // single Expand, not a union of scans
    long.queryExecution.optimizedPlan.toString should include("Expand")
  }

  test("exactQuantiles is invariant under input partitioning") {
    import spark.implicits._
    val d = (1 to 500).map(i => (i * 31 % 97).toLong).toDF("v")
    assertSameRows(
      Profiling.exactQuantiles(d, "v", Seq(100, 500, 900)),
      Profiling.exactQuantiles(d.repartition(13), "v", Seq(100, 500, 900)))
  }
}
