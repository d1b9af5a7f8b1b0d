package graft.analytics

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed MRR / precision@k / recall@k") {
    val results = Seq(
      ("q1", "A", 1L), ("q1", "B", 2L), ("q1", "C", 3L),
      ("q1", "D", 4L), ("q1", "E", 5L))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q1", "B"), ("q1", "D"), ("q1", "Z")) // Z never retrieved
      .toDF("query_id", "doc_id")
    val r = Ranking.rankingMetrics(results, truth, k = 3).collect().head
    r.getLong(1) shouldBe 5L           // n_results
    r.getLong(2) shouldBe 3L           // n_relevant includes unretrieved Z
    r.getLong(3) shouldBe 2L           // first relevant at rank 2
    r.getLong(4) shouldBe 500000L      // rr_e6 = 10^6 div 2
    r.getLong(5) shouldBe 1L           // hits@3: only B
    r.getLong(6) shouldBe 333L         // precision@3 permille
    r.getLong(7) shouldBe 333L         // recall@3 permille
  }

  test("failure modes surface: truth-only queries report zeros, truth-less NULL recall") {
    val results = Seq(("q2", "A", 1L)).toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q3", "B")).toDF("query_id", "doc_id")
    val out = Ranking.rankingMetrics(results, truth, k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    // q3: relevant docs, zero results — the retrieval failure must NOT vanish
    out("q3").getLong(1) shouldBe 0L
    out("q3").getLong(2) shouldBe 1L
    out("q3").isNullAt(3) shouldBe true
    out("q3").getLong(7) shouldBe 0L   // recall 0, defined
    // q2: results but nothing was asked for — recall undefined, not zero
    out("q2").getLong(5) shouldBe 0L
    out("q2").isNullAt(7) shouldBe true
  }

  test("duplicate truth rows don't inflate n_relevant") {
    val results = Seq(("q", "A", 1L)).toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q", "A"), ("q", "A")).toDF("query_id", "doc_id")
    val r = Ranking.rankingMetrics(results, truth, k = 1).collect().head
    r.getLong(2) shouldBe 1L
    r.getLong(6) shouldBe 1000L
    r.getLong(7) shouldBe 1000L
  }

  test("averagePrecision: hand case with an unretrieved relevant doc") {
    // rel at ranks 1 and 3; Z unretrieved: AP = (P@1 + P@3)/R
    //   = (floor(1e6*1/1) + floor(1e6*2/3)) div 3
    //   = (1000000 + 666666) div 3 = 555555
    val results = Seq(
      ("q1", "A", 1L), ("q1", "B", 2L), ("q1", "C", 3L), ("q1", "D", 4L))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q1", "A"), ("q1", "C"), ("q1", "Z"))
      .toDF("query_id", "doc_id")
    val r = Ranking.averagePrecision(results, truth).collect().head
    r.getLong(1) shouldBe 4L       // n_results
    r.getLong(2) shouldBe 3L       // n_relevant includes unretrieved Z
    r.getLong(3) shouldBe 2L       // n_hits
    r.getLong(4) shouldBe 555555L  // ap_e6
  }

  test("averagePrecision: perfect head ranking = 1e6; failure modes surface") {
    // both relevant docs at the top: AP = (1e6 + 1e6) div 2 = 1e6
    val results = Seq(("q1", "A", 1L), ("q1", "B", 2L), ("q1", "C", 3L))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q1", "A"), ("q1", "B"),
      ("q2", "X"),               // relevant but NO results: ap must be 0
      ("q1", "A"))               // duplicate truth must not inflate R
      .toDF("query_id", "doc_id")
    val out = Ranking.averagePrecision(results, truth)
      .collect().map(r => r.getString(0) -> r).toMap
    out("q1").getLong(2) shouldBe 2L
    out("q1").getLong(4) shouldBe 1000000L
    out("q2").getLong(1) shouldBe 0L
    out("q2").getLong(4) shouldBe 0L   // retrieval failure, not NULL
    // results with no truth at all: AP undefined, not zero
    val noTruth = Ranking.averagePrecision(results,
      Seq(("q9", "Y")).toDF("query_id", "doc_id"))
      .collect().map(r => r.getString(0) -> r).toMap
    noTruth("q1").isNullAt(4) shouldBe true
  }

  test("averagePrecision is invariant under input partitioning") {
    val results = (1 to 200).map(i =>
      (s"q${i % 7}", s"d$i", ((i * 13) % 40 + 1).toLong))
      .toDF("query_id", "doc_id", "rank")
      .withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"query_id").orderBy($"rank", $"doc_id")))
    val truth = (1 to 200).filter(_ % 3 == 0).map(i =>
      (s"q${i % 7}", s"d$i")).toDF("query_id", "doc_id")
    assertSameRows(
      Ranking.averagePrecision(results, truth),
      Ranking.averagePrecision(results.repartition(7),
        truth.repartition(5)))
  }

  test("isotonicCalibration: already-monotone rates pass through; a violation pools") {
    // bins (score, n, pos): (1, 4, 0), (2, 4, 2), (3, 4, 4) — strictly
    // increasing rates 0, 500000, 1000000 must pass through unchanged
    def mk(rows: (Long, Long)*) = rows.toDF("score", "label")
    val mono = mk((1 to 4).map(_ => (1L, 0L)) ++
      Seq((2L, 0L), (2L, 0L), (2L, 1L), (2L, 1L)) ++
      (1 to 4).map(_ => (3L, 1L)): _*)
    val outM = Ranking.isotonicCalibration(mono, "label", "score")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("iso_rate_e6")).toMap
    outM shouldBe Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L)
    // violation: rates 1 then 0 with equal n pools to 1/2 on both bins
    val viol = mk((1L, 1L), (1L, 1L), (2L, 0L), (2L, 0L))
    val outV = Ranking.isotonicCalibration(viol, "label", "score")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("iso_rate_e6")).toMap
    outV shouldBe Map(1L -> 500000L, 2L -> 500000L)
  }

  test("isotonicCalibration output is monotone and partition-invariant") {
    // noisy hash labels: the fit must be non-decreasing in score
    val scored = (1 to 500).map { i =>
      val s = (i * 37) % 11
      (s.toLong, if ((i * 13) % 10 < s) 1L else 0L)
    }.toDF("score", "label")
    val out = Ranking.isotonicCalibration(scored, "label", "score")
      .orderBy($"score").collect().map(_.getAs[Long]("iso_rate_e6"))
    out.sliding(2).foreach { case Array(a, b) => a should be <= b }
    assertSameRows(
      Ranking.isotonicCalibration(scored, "label", "score"),
      Ranking.isotonicCalibration(scored.repartition(9), "label", "score"))
  }

  test("rocAuc: perfect separation = 1e6; all-tied = exactly 500000") {
    val perfect = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L))
      .toDF("y", "score")
    val p = Ranking.rocAuc(perfect, "y", "score").collect().head
    p.getLong(0) shouldBe 5L
    p.getLong(1) shouldBe 2L
    p.getLong(2) shouldBe 3L
    p.getLong(3) shouldBe 5L
    p.getLong(4) shouldBe 1000000L
    val tied = Seq((0L, 7L), (0L, 7L), (1L, 7L), (1L, 7L)).toDF("y", "score")
    val t = Ranking.rocAuc(tied, "y", "score").collect().head
    t.getLong(3) shouldBe 1L
    t.getLong(4) shouldBe 500000L      // ties count half, exactly
  }

  test("rocAuc: hand-computed mixed ties give floor(5/6 * 1e6)") {
    // neg scores 1,2,2; pos 2,3: pairwise 1 + 0.5 + 0.5 + 3 of 6 -> 5/6
    val d = Seq((0L, 1L), (0L, 2L), (0L, 2L), (1L, 2L), (1L, 3L))
      .toDF("y", "score")
    Ranking.rocAuc(d, "y", "score").collect().head.getLong(4) shouldBe 833333L
  }

  test("rocAuc: single-class input reports NULL, not 0.5") {
    val d = Seq((1L, 1L), (1L, 2L)).toDF("y", "score")
    Ranking.rocAuc(d, "y", "score").collect().head.isNullAt(4) shouldBe true
  }

  test("rocAuc is invariant under input partitioning") {
    val d = (1 to 300).map(i => (((i * 7 % 13) % 2).toLong, (i * 31 % 47).toLong))
      .toDF("y", "score")
    assertSameRows(Ranking.rocAuc(d, "y", "score"),
      Ranking.rocAuc(d.repartition(11), "y", "score"))
  }

  test("calibrationTable: hand bins, clamped top edge, exact Brier") {
    val d = Seq((50L, 0L), (50L, 1L), (1000L, 1L)).toDF("p", "y")
    val out = Ranking.calibrationTable(d, "y", "p")
      .collect().map(r => r.getLong(0) -> r).toMap
    val b0 = out(0L)
    b0.getLong(1) shouldBe 2L          // n
    b0.getLong(2) shouldBe 1L          // n_pos
    b0.getLong(3) shouldBe 50L         // conf
    b0.getLong(4) shouldBe 500L        // rate
    b0.getLong(5) shouldBe 452500L     // (2500 + 902500)/2
    b0.getLong(6) shouldBe 450L        // gap
    out(9L).getLong(1) shouldBe 1L     // p=1000 lands in bin 9, not 10
    out(9L).getLong(5) shouldBe 0L     // claimed certainty, correct
  }

  test("calibrationTable: overconfident scorer shows the gap AUC can't see") {
    val d = (1 to 100).map(i => (900L, (i % 2).toLong)).toDF("p", "y")
    val r = Ranking.calibrationTable(d, "y", "p").collect().head
    r.getLong(3) shouldBe 900L
    r.getLong(4) shouldBe 500L
    r.getLong(6) shouldBe 400L
  }

  test("liftTable: hand-computed quintiles — gains, rates, total lift lands at 1000") {
    // scores 10..1 by id; positives at ranks 1,2,3 and 10
    val d = (1 to 10).map(i =>
      (i.toLong, (11 - i).toLong, if (i <= 3 || i == 10) 1L else 0L))
      .toDF("id", "score", "y")
    val out = Ranking.liftTable(d, "y", "score", "id", nBuckets = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(0L).getLong(2) shouldBe 2L        // top quintile: both positive
    out(0L).getLong(3) shouldBe 1000L
    out(0L).getLong(6) shouldBe 500L      // half of all positives captured
    out(0L).getLong(7) shouldBe 2500L     // 2.5x the base rate
    out(1L).getLong(6) shouldBe 750L
    out(1L).getLong(7) shouldBe 1875L
    out(4L).getLong(6) shouldBe 1000L     // everything captured at 100%
    out(4L).getLong(7) shouldBe 1000L     // total lift is always 1.0
  }

  test("liftTable: no positives -> NULL gain and lift, not zero") {
    val d = (1 to 10).map(i => (i.toLong, i.toLong, 0L)).toDF("id", "score", "y")
    val r = Ranking.liftTable(d, "y", "score", "id", nBuckets = 2)
      .collect().head
    r.isNullAt(6) shouldBe true
    r.isNullAt(7) shouldBe true
  }

  test("liftTable is invariant under input partitioning") {
    val d = (1 to 137).map(i =>
      (i.toLong, (i * 29 % 61).toLong, ((i * 13 % 7) % 2).toLong))
      .toDF("id", "score", "y")
    assertSameRows(Ranking.liftTable(d, "y", "score", "id"),
      Ranking.liftTable(d.repartition(8), "y", "score", "id"))
  }

  test("calibrationTable is invariant under input partitioning") {
    val d = (1 to 200).map(i => ((i * 37 % 1001).toLong, (i % 3 % 2).toLong))
      .toDF("p", "y")
    assertSameRows(Ranking.calibrationTable(d, "y", "p"),
      Ranking.calibrationTable(d.repartition(7), "y", "p"))
  }

  private def bruteSkyline(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filterNot { case (x, y) => pts.exists { case (a, b) =>
      a >= x && b >= y && (a > x || b > y) } }.toSet

  test("skyline: hand staircase with equal-x and equal-y ties") {
    // frontier (1,9),(3,7),(5,5); (3,6) loses to (3,7); (2,7) to (3,7)
    val pts = Seq((1L, 9L), (3L, 7L), (5L, 5L), (3L, 6L), (2L, 7L),
      (4L, 4L), (1L, 1L))
    val out = Ranking.skyline(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet
    out shouldBe Set((1L, 9L), (3L, 7L), (5L, 5L))
    out shouldBe bruteSkyline(pts)
  }

  test("skyline: exact duplicate points both survive (neither dominates)") {
    val pts = Seq((2L, 2L), (2L, 2L), (1L, 3L))
    val out = Ranking.skyline(pts.toDF("x", "y"), "x", "y").collect()
    out.count(r => r.getAs[Long]("x") == 2L) shouldBe 2
    out.length shouldBe 3
  }

  test("skyline matches brute force on pseudo-random points, any partitioning") {
    val pts = (1 to 400).map(i =>
      ((i * 7919 % 101).toLong, (i * 104729 % 97).toLong))
    val expected = bruteSkyline(pts)
    val out = Ranking.skyline(pts.toDF("x", "y").repartition(13), "x", "y")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet
    out shouldBe expected
    // extra payload columns ride through untouched
    val withPayload = pts.zipWithIndex.map { case ((x, y), i) =>
      (x, y, s"row$i") }.toDF("x", "y", "tag")
    Ranking.skyline(withPayload, "x", "y")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet shouldBe expected
  }

  test("exclusivePrefixMax matches the single-partition window reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = (1 to 300).map(i => ((i * 37 % 1009).toLong, (i * 53 % 211).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }.toSeq
      .toDF("k", "v")
    val ref = d.withColumn("m",
        max(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .collect().map(r => r.getAs[Long]("k") ->
        Option(r.get(r.fieldIndex("m")))).toMap
    val got = Distributed.exclusivePrefixMax(d.repartition(11), "k", "v", "m")
      .collect().map(r => r.getAs[Long]("k") ->
        Option(r.get(r.fieldIndex("m")))).toMap
    got shouldBe ref
  }

  private def leg(rows: (String, String, Long)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("reciprocalRankFusion: hand sums, single-leg docs, doc-id tiebreak") {
    val a = leg(("q1", "d1", 1L), ("q1", "d2", 2L), ("q1", "d3", 3L))
    val b = leg(("q1", "d2", 1L), ("q1", "d1", 2L))
    val out = Ranking.reciprocalRankFusion(Seq(a, b))
      .collect().sortBy(_.getAs[Long]("fused_rank"))
    // 10^6 div 61 = 16393, div 62 = 16129, div 63 = 15873.
    // d1 and d2 swap ranks across legs -> equal sums 32522; the tie
    // breaks by doc id, d1 first. d3 appears in one leg only.
    out.map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("rrf_e6"),
      r.getAs[Long]("n_systems"), r.getAs[Long]("fused_rank"))) shouldBe
      Array(("d1", 32522L, 2L, 1L), ("d2", 32522L, 2L, 2L),
        ("d3", 15873L, 1L, 3L))
  }

  test("reciprocalRankFusion: topK cuts per query, queries stay independent") {
    val a = leg(("q1", "dA", 1L), ("q1", "dB", 2L), ("q1", "dC", 3L),
      ("q2", "dX", 1L))
    val b = leg(("q2", "dY", 1L), ("q2", "dX", 2L))
    val out = Ranking.reciprocalRankFusion(Seq(a, b), topK = 2)
      .collect().map(r => (r.getAs[String]("query_id"),
        r.getAs[String]("doc_id"), r.getAs[Long]("fused_rank")))
      .sortBy(t => (t._1, t._3))
    out shouldBe Array(("q1", "dA", 1L), ("q1", "dB", 2L),
      ("q2", "dX", 1L), ("q2", "dY", 2L))
    // dX leads q2: 16393 + 16129 beats dY's single 16393
  }

  test("reciprocalRankFusion plan: the top-k compiles to a pre-shuffle WindowGroupLimit") {
    val a = leg(("q1", "d1", 1L), ("q1", "d2", 2L))
    val b = leg(("q1", "d2", 1L), ("q1", "d3", 2L))
    val out = Ranking.reciprocalRankFusion(Seq(a, b), topK = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("reciprocalRankFusion: leg order and partitioning do not matter; guards refuse") {
    val a = leg(("q1", "d1", 1L), ("q1", "d2", 2L))
    val b = leg(("q1", "d2", 1L), ("q1", "d3", 2L))
    val ab = Ranking.reciprocalRankFusion(Seq(a, b)).collect().toSet
    val ba = Ranking.reciprocalRankFusion(Seq(b, a)).collect().toSet
    val rep = Ranking.reciprocalRankFusion(
      Seq(a.repartition(5), b.repartition(3))).collect().toSet
    ab shouldBe ba
    ab shouldBe rep
    an[IllegalArgumentException] should be thrownBy
      Ranking.reciprocalRankFusion(Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Ranking.reciprocalRankFusion(Seq(a), rrfK = 0)
  }
}
