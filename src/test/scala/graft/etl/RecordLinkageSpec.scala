package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.etl.RecordLinkage.FsField

/** [[RecordLinkage]] — hand-computed weight arithmetic, the three-way
  * decision rule at its exact boundaries, the NULL-evidence
  * convention, evidence monotonicity, config validation, and
  * partitioning invariance. */
class RecordLinkageSpec extends SparkSpec {

  private val fields = Seq(
    FsField("name", 900, 100),   // wa = log2(9)*1000 = 3170, wd = log2(100/900) = -3170
    FsField("city", 800, 200))   // wa = log2(4)*1000 = 2000, wd = log2(200/800) = -2000

  private def pairs(rows: (Long, Long, java.lang.Boolean, java.lang.Boolean)*): DataFrame =
    df(StructType(Seq(
      StructField("rec_a", LongType),
      StructField("rec_b", LongType),
      StructField("agr_name", BooleanType),
      StructField("agr_city", BooleanType))),
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)): _*)

  test("weightMilliBits: hand values (log2 of clean ratios)") {
    RecordLinkage.weightMilliBits(900, 100) shouldBe 3170L  // log2(9)=3.1699
    RecordLinkage.weightMilliBits(100, 900) shouldBe -3170L
    RecordLinkage.weightMilliBits(800, 200) shouldBe 2000L  // log2(4)
    RecordLinkage.weightMilliBits(500, 500) shouldBe 0L
  }

  test("hand scores and the three-way rule at exact boundaries") {
    val out = RecordLinkage.fellegiSunterScores(pairs(
        (1L, 2L, true, true),    // 3170 + 2000 = 5170  -> match (>= 4000)
        (3L, 4L, true, false),   // 3170 - 2000 = 1170  -> possible
        (5L, 6L, false, true),   // -3170 + 2000 = -1170 -> possible
        (7L, 8L, false, false)), // -3170 - 2000 = -5170 -> non_match
        fields, upperMilliBits = 4000L, lowerMilliBits = -4000L)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getString(5))).toSet
    out shouldBe Set(
      (1L, 5170L, "match"), (3L, 1170L, "possible"),
      (5L, -1170L, "possible"), (7L, -5170L, "non_match"))
  }

  test("thresholds are inclusive: score == upper is match, == lower is non_match") {
    val out = RecordLinkage.fellegiSunterScores(pairs(
        (1L, 2L, true, true), (3L, 4L, false, false)),
        fields, upperMilliBits = 5170L, lowerMilliBits = -5170L)
      .collect().map(r => (r.getLong(0), r.getString(5))).toSet
    out shouldBe Set((1L, "match"), (3L, "non_match"))
  }

  test("NULL agreement contributes zero evidence (the F-S missing-field rule)") {
    val out = RecordLinkage.fellegiSunterScores(pairs(
        (1L, 2L, null, true),     // 0 + 2000
        (3L, 4L, null, null)),    // 0 + 0
        fields, upperMilliBits = 4000L, lowerMilliBits = -4000L)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    out shouldBe Set((1L, 2000L), (3L, 0L))
  }

  test("evidence monotonicity: flipping any field to agree never lowers the score") {
    val base = RecordLinkage.fellegiSunterScores(
      pairs((1L, 2L, false, false)), fields, 4000L, -4000L)
      .collect().head.getLong(4)
    val nameUp = RecordLinkage.fellegiSunterScores(
      pairs((1L, 2L, true, false)), fields, 4000L, -4000L)
      .collect().head.getLong(4)
    val bothUp = RecordLinkage.fellegiSunterScores(
      pairs((1L, 2L, true, true)), fields, 4000L, -4000L)
      .collect().head.getLong(4)
    base should be < nameUp
    nameUp should be < bothUp
  }

  test("config validation: m/u bounds, duplicate fields, threshold order") {
    an[IllegalArgumentException] should be thrownBy FsField("x", 100, 900) // u > m
    an[IllegalArgumentException] should be thrownBy FsField("x", 1000, 10) // m = 1000
    an[IllegalArgumentException] should be thrownBy FsField("x", 900, 0)   // u = 0
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.fellegiSunterScores(pairs(), Seq.empty, 1L, 0L)
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.fellegiSunterScores(pairs(),
        Seq(FsField("a", 900, 100), FsField("a", 800, 200)), 1L, 0L)
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.fellegiSunterScores(pairs(), fields, 0L, 0L)
  }

  test("posteriorWeights: exact single-field hand values") {
    val f = Seq(FsField("x", 900, 100))
    val w = RecordLinkage.posteriorWeights(f, 500)
    // prior 1/2: w(agree) = 900/(900+100), w(disagree) = 100/(100+900)
    w shouldBe Seq(0.1, 0.9)
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.posteriorWeights(f, 0)
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.posteriorWeights(
        (1 to 5).map(i => FsField(s"f$i", 900, 100)), 500)
  }

  private def onePairs(rows: (Long, java.lang.Boolean)*): DataFrame =
    df(StructType(Seq(
      StructField("rec_a", LongType),
      StructField("agr_x", BooleanType))),
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)): _*)

  test("emStep: closed-form single-field update; NULL pairs excluded") {
    val f = Seq(FsField("x", 900, 100))
    // 8 agreements, 2 disagreements, one NULL (must not count)
    val p = onePairs(((1L to 8L).map(i => (i, java.lang.Boolean.TRUE)) ++
      Seq((9L, java.lang.Boolean.FALSE), (10L, java.lang.Boolean.FALSE),
        (11L, null: java.lang.Boolean))): _*)
    val out = RecordLinkage.emStep(p, f, priorPermille = 500)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    // expectations mirror the operator's exact fold order (g = 0, 1);
    // w = (0.1, 0.9) from the hand case above
    val nW = 2 * 0.1 + 8 * 0.9
    val nU = 2 * (1.0 - 0.1) + 8 * (1.0 - 0.9)
    out("x")._1 shouldBe (8 * 0.9 / nW * 1000.0)         // ~972.97
    out("x")._2 shouldBe (8 * (1.0 - 0.9) / nU * 1000.0) // ~307.69
    out("prior")._1 shouldBe (nW / (2.0 + 8.0) * 1000.0) // ~740
    Option(out("prior")._2) shouldBe None
  }

  test("emStep: a discriminating field's m rises and u falls from a vague start") {
    // two fields; planted: agreements strongly co-occur (matches)
    val rows = (1L to 60L).map { i =>
      val isMatch = i <= 20
      (i, i + 100L,
        java.lang.Boolean.valueOf(isMatch || i % 10 == 0),
        java.lang.Boolean.valueOf(isMatch || i % 7 == 0))
    }
    val p = pairs(rows: _*)
    val vague = Seq(FsField("name", 600, 400), FsField("city", 600, 400))
    val out = RecordLinkage.emStep(p, vague, priorPermille = 300)
      .collect().map(r => r.getString(0) -> (r.getDouble(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    out("name")._1 should be > 600.0 // m grows toward the match cluster
    out("name")._2 should be < 400.0 // u shrinks toward the background rate
    out("city")._1 should be > 600.0
  }

  test("deterministic across partitionings") {
    val p = pairs((1L to 40L).map(i =>
      (i, i + 100L,
        java.lang.Boolean.valueOf(i % 2 == 0),
        java.lang.Boolean.valueOf(i % 3 == 0))): _*)
    assertSameRows(
      RecordLinkage.fellegiSunterScores(p, fields, 4000L, -4000L),
      RecordLinkage.fellegiSunterScores(p.repartition(7), fields, 4000L, -4000L))
  }
}
