package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def vals(vs: String*) = vs.toDF("v")

  test("hllSketch registers: rho is the bin()-derived leading-zero rank, mergeable by max") {
    val d = vals((1 to 400).map(i => s"item$i"): _*)
    val sk = Sketches.hllSketch(d, "v")
    // registers bounded by m and by the distinct count
    sk.count() should be <= 1024L
    // hand-check one value against the definitional formula
    val rows = sk.as[(Long, Long)].collect()
    all(rows.map(_._1)) should (be >= 0L and be < 1024L)
    all(rows.map(_._2)) should (be >= 1L and be <= 47L)
    // merge(x, x) = x (idempotent), merge of splits = global
    assertSameRows(Sketches.hllMerge(sk, sk), sk)
    val a = Sketches.hllSketch(vals((1 to 200).map(i => s"item$i"): _*), "v")
    val b = Sketches.hllSketch(vals((201 to 400).map(i => s"item$i"): _*), "v")
    assertSameRows(Sketches.hllMerge(a, b), sk)
    // duplicates change nothing: the sketch sees values, not rows
    assertSameRows(Sketches.hllSketch(
      vals(((1 to 400) ++ (1 to 400)).map(i => s"item$i"): _*), "v"), sk)
  }

  test("hllEstimate: small range uses the linear-counting table and lands near exact") {
    val d = vals((1 to 300).map(i => s"u$i"): _*)
    val r = Sketches.hllEstimate(Sketches.hllSketch(d, "v")).collect().head
    r.getAs[Long]("m") shouldBe 1024L
    r.getAs[Long]("n_zero") should be > 0L
    val est = r.getAs[Long]("est_milli") / 1000.0
    // linear counting at n/m ~ 0.3 is typically within a few percent
    est should be > 250.0
    est should be < 350.0
    // the branch really is the table: est_milli equals the table entry
    r.getAs[Long]("est_milli") shouldBe
      Sketches.linearCountMilli(r.getAs[Long]("n_zero").toInt)
  }

  test("hllEstimate: large range uses the harmonic estimate within the 3-sigma band") {
    val n = 60000
    val d = spark.range(n).select(concat(lit("val"), col("id")).as("v"))
    val r = Sketches.hllEstimate(Sketches.hllSketch(d, "v")).collect().head
    val est = r.getAs[Long]("est_milli") / 1000.0
    // sigma = 1.04/sqrt(1024) = 3.25%; allow 3 sigma ~ 10%
    est should be > (n * 0.90)
    est should be < (n * 1.10)
    r.getAs[Long]("s_scaled") should be > 0L
  }

  test("cmsSketch/cmsQuery: estimate >= exact always; exact when width is unsaturated; merge = global") {
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"tok$i"))
    val d = rows.toDF("v")
    val sk = Sketches.cmsSketch(d, "v")
    sk.count() should be <= (4L * 1024L)
    val probes = (1 to 50).map(i => s"tok$i").toDF("v")
    val est = Sketches.cmsQuery(sk, probes, "v")
      .as[(String, Long)].collect().toMap
    (1 to 50).foreach { i =>
      withClue(s"tok$i: ") { est(s"tok$i") should be >= i.toLong }
    }
    // 50 distinct values in 4x1024 cells: no collisions, all exact
    (1 to 50).foreach(i => est(s"tok$i") shouldBe i.toLong)
    // absent value: every cell it hashes to may exist, but with 50
    // occupied cells of 4096 a fresh value almost surely maps to an
    // empty cell in SOME row -> 0; at minimum the guarantee holds
    val ghost = Sketches.cmsQuery(sk, vals("never-seen"), "v")
      .as[(String, Long)].head()._2
    ghost should be >= 0L
    // linearity: merge of split sketches equals the global sketch
    val a = Sketches.cmsSketch(rows.take(600).toDF("v"), "v")
    val b = Sketches.cmsSketch(rows.drop(600).toDF("v"), "v")
    assertSameRows(Sketches.cmsMerge(a, b), sk)
  }

  test("cms overestimates appear once the domain saturates the width, never underestimates") {
    // 20k distinct values over 4x1024 cells: every row has ~20 values
    // per cell, so min-over-rows must overestimate somewhere
    val d = spark.range(20000).select(concat(lit("x"), col("id")).as("v"))
    val sk = Sketches.cmsSketch(d, "v")
    val probes = spark.range(100).select(concat(lit("x"), col("id")).as("v"))
    val est = Sketches.cmsQuery(sk, probes, "v").as[(String, Long)].collect()
    all(est.map(_._2)) should be >= 1L // never under the true count 1
    est.map(_._2).max should be > 1L   // and collisions are visible
  }

  test("hllOverlap: inclusion-exclusion lands near the true intersection; disjoint sets near zero") {
    val a = vals((1 to 2000).map(i => s"k$i"): _*)
    val b = vals((1001 to 3000).map(i => s"k$i"): _*) // true overlap 1000
    val r = Sketches.hllOverlap(
      Sketches.hllSketch(a, "v"), Sketches.hllSketch(b, "v"))
      .collect().head
    val inter = r.getAs[Long]("est_intersection_milli") / 1000.0
    // each term carries ~3.25% sigma of its OWN magnitude (~2-3k), so
    // the I-E noise floor is a few hundred — allow a wide band
    inter should be > 500.0
    inter should be < 1500.0
    // union consistency: est(A u B) <= est(A) + est(B) in millis
    r.getAs[Long]("est_union_milli") should be <=
      (r.getAs[Long]("est_a_milli") + r.getAs[Long]("est_b_milli"))
    // disjoint sets: clamped at zero or a small noise value
    val d = Sketches.hllOverlap(
      Sketches.hllSketch(vals((1 to 500).map(i => s"p$i"): _*), "v"),
      Sketches.hllSketch(vals((1 to 500).map(i => s"q$i"): _*), "v"))
      .collect().head
    d.getAs[Long]("est_intersection_milli") should be >= 0L
    (d.getAs[Long]("est_intersection_milli") / 1000.0) should be < 100.0
  }

  test("hllSketchBy/hllEstimateBy: per-group registers equal the per-group global sketch") {
    val d = ((1 to 300).map(i => ("a", s"x$i")) ++
      (1 to 40).map(i => ("b", s"y$i"))).toDF("g", "v")
    val grouped = Sketches.hllSketchBy(d, "g", "v")
    // each group's slice of the grouped sketch IS that group's sketch
    assertSameRows(
      grouped.filter(col("group") === "a").drop("group"),
      Sketches.hllSketch(d.filter(col("g") === "a"), "v"))
    val est = Sketches.hllEstimateBy(grouped)
      .select("group", "est_milli").as[(String, Long)].collect().toMap
    (est("a") / 1000.0) should (be > 260.0 and be < 340.0)
    (est("b") / 1000.0) should (be > 34.0 and be < 46.0)
    // and the per-group estimate equals hllEstimate run on the slice
    val single = Sketches.hllEstimate(
      Sketches.hllSketch(d.filter(col("g") === "b"), "v"))
      .select("est_milli").as[Long].head()
    est("b") shouldBe single
  }

  test("hdrSketch buckets: hand formula, exact singletons below 64, merge of splits = global") {
    val d = Seq(0L, 1L, 2L, 63L, 64L, 65L, 100L, 1000L, 1000000L).toDF("v")
    val sk = Sketches.hdrSketch(d, "v").as[(Int, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // below 2^(subBits+1)=64: exp=0, man=v (exact singleton buckets)
    sk((0, 0L)) shouldBe 1L
    sk((0, 1L)) shouldBe 1L
    sk((0, 63L)) shouldBe 1L
    // 64: bitlen 7, exp=1, man=32 -> [64,65] — 64 and 65 SHARE it
    sk((1, 32L)) shouldBe 2L
    // 100: bitlen 7, exp=1, man=50 -> [100,101]
    sk((1, 50L)) shouldBe 1L
    // 1000: bitlen 10, exp=4, man=62 -> [992,1007]
    sk((4, 62L)) shouldBe 1L
    // 1000000: bitlen 20, exp=14, man=61 -> [999424, 1015807]
    sk((14, 61L)) shouldBe 1L
    // merge by SUM: split sketches add to the global (a histogram
    // counts rows — duplicates COUNT, unlike HLL)
    val big = (1 to 500).map(i => (i * i * 31 + 7).toLong)
    val glob = Sketches.hdrSketch(big.toDF("v"), "v")
    val a = Sketches.hdrSketch(big.take(200).toDF("v"), "v")
    val b = Sketches.hdrSketch(big.drop(200).toDF("v"), "v")
    assertSameRows(Sketches.hdrMerge(a, b), glob)
    assertSameRows(Sketches.hdrSketch(
      (big ++ big).toDF("v"), "v"),
      glob.withColumn("cnt", col("cnt") * 2))
  }

  test("hdrQuantiles: containment identity, exact low range, q0=min, q1000=max, relative-error bound") {
    // small values (< 64) are exact: lo = hi = the true order statistic
    val small = (1 to 50).map(_.toLong)
    val qsmall = Sketches.hdrQuantiles(
      Sketches.hdrSketch(small.toDF("v"), "v"), Seq(0, 500, 1000))
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    qsmall(0) shouldBe ((0, 50L, 1L, 1L, 1L, 1L))     // min
    qsmall(500) shouldBe ((500, 50L, 25L, 25L, 25L, 25L)) // median
    qsmall(1000) shouldBe ((1000, 50L, 50L, 50L, 50L, 50L)) // max
    // large deterministic values: the rank-r order statistic must lie
    // in [lo, hi] (an identity), and the bucket width obeys the 2^-5
    // relative bound
    val big = (1 to 2000).map(i => (i.toLong * i * 997 + 13))
    val sorted = big.sorted
    val qs = Seq(0, 100, 250, 500, 750, 900, 990, 1000)
    val out = Sketches.hdrQuantiles(
      Sketches.hdrSketch(big.toDF("v"), "v"), qs)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    out.length shouldBe qs.length
    out.foreach { case (q, n, rank, lo, hi, est) =>
      n shouldBe 2000L
      val expectRank = math.max(1L, (q * 2000L + 999) / 1000)
      rank shouldBe expectRank
      val exact = sorted(rank.toInt - 1)
      withClue(s"q=$q exact=$exact: ") {
        exact should (be >= lo and be <= hi)
        est should (be >= lo and be <= hi)
        (hi - lo) should be <= math.max(1L, lo >> Sketches.hdrSubBits)
      }
    }
  }

  test("hdrSketchBy/hdrQuantilesBy: per-group slices equal the single-group run; negatives raise") {
    val d = ((1 to 300).map(i => ("a", (i * 7 + 1).toLong)) ++
      (1 to 40).map(i => ("b", (i * 1000).toLong))).toDF("g", "v")
    val grouped = Sketches.hdrSketchBy(d, "g", "v")
    assertSameRows(
      grouped.filter(col("group") === "a").drop("group"),
      Sketches.hdrSketch(d.filter(col("g") === "a"), "v"))
    val byG = Sketches.hdrQuantilesBy(grouped, Seq(500, 1000))
    assertSameRows(
      byG.filter(col("group") === "b").drop("group"),
      Sketches.hdrQuantiles(
        Sketches.hdrSketch(d.filter(col("g") === "b"), "v"), Seq(500, 1000)))
    // grouped merge: hdrMerge keys on every non-cnt column
    val ga = Sketches.hdrSketchBy(d.limit(100), "g", "v")
    val gb = Sketches.hdrSketchBy(d.except(d.limit(100)), "g", "v")
    Sketches.hdrMerge(ga, gb).columns.toSeq shouldBe
      Seq("group", "exp", "man", "cnt")
    // negative values refuse loudly, never a silent wrong bucket
    val neg = Seq(5L, -3L).toDF("v")
    val e = intercept[Exception] {
      Sketches.hdrSketch(neg, "v").collect()
    }
    e.getMessage should include("negative value")
    // empty sketch -> empty quantile frame, no division error
    Sketches.hdrQuantiles(
      Sketches.hdrSketch(Seq.empty[Long].toDF("v"), "v"), Seq(500))
      .count() shouldBe 0L
    // partition invariance
    val big = (1 to 400).map(i => (i * 13 + 5).toLong).toDF("v")
    assertSameRows(Sketches.hdrSketch(big, "v"),
      Sketches.hdrSketch(big.repartition(7), "v"))
  }

  test("sketches skip NULLs and are partition-invariant") {
    val d = (Seq[Option[String]](None, Some("a"), Some("b"), None) ++
      (1 to 100).map(i => Some(s"c$i"))).toDF("v")
    assertSameRows(Sketches.hllSketch(d, "v"),
      Sketches.hllSketch(d.repartition(7), "v"))
    assertSameRows(Sketches.cmsSketch(d, "v"),
      Sketches.cmsSketch(d.repartition(7), "v"))
    val est = Sketches.hllEstimate(Sketches.hllSketch(d, "v")).collect().head
    // 102 non-null distinct values
    est.getAs[Long]("n_used") should be <= 102L
  }
}
