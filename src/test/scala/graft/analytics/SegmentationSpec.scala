package graft.analytics

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SegmentationSpec extends SparkSpec {

  private val valSchema = StructType(Seq(
    StructField("v", LongType, nullable = false)))

  test("exactBands: band is a pure function of the value, ties share") {
    // n=10, k=5; cum_lt per distinct value: 1→0, 2→3, 3→4, 4→6,
    // 5→7, 10→9 ⇒ bands 1,2,3,4,4,5 by (5·cum_lt) div 10 + 1.
    val rows = Seq(1L, 1L, 1L, 2L, 3L, 3L, 4L, 5L, 5L, 10L)
    val out = Segmentation.exactBands(
        df(valSchema, rows.map(Row(_)): _*), "v", 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out shouldBe Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 4, 10L -> 5)
  }

  test("exactBands matches the brute-force definition on random data") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(rnd.nextInt(30).toLong)
    val n = rows.size
    val k = 5
    val expected = rows.distinct.map { v =>
      v -> ((k * rows.count(_ < v)) / n + 1)
    }.toMap
    val out = Segmentation.exactBands(
        df(valSchema, rows.map(Row(_)): _*), "v", k)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out shouldBe expected
    all(out.values) should (be >= 1 and be <= k)
  }

  private val orderSchema = StructType(Seq(
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_orderdate", DateType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false)))

  private def day(i: Int) = java.sql.Date.valueOf(f"2024-01-${i}%02d")

  test("rfm: exact cents, anchored recency, inverted r_score, cell compose") {
    // Anchor = 2024-01-20 (customer 3's last order).
    val orders = df(orderSchema,
      Row(1L, day(1), 10.005),  // half-up → 10.01 → 1001 cents
      Row(1L, day(2), 20.0),
      Row(2L, day(10), 500.0),
      Row(3L, day(20), 99.999), // → 100.00 → 10000 cents
      Row(3L, day(5), 1.0),
      Row(3L, day(15), 2.0))
    val out = Segmentation.rfm(orders).collect()
      .map(r => r.getAs[Long]("customer") -> r).toMap

    out(1L).getAs[Long]("monetary_cents") shouldBe 3001L
    out(3L).getAs[Long]("monetary_cents") shouldBe 10300L
    out(1L).getAs[Long]("recency_days") shouldBe 18L
    out(2L).getAs[Long]("recency_days") shouldBe 10L
    out(3L).getAs[Long]("recency_days") shouldBe 0L
    // Most recent customer gets the TOP r_score; stalest the bottom.
    out(3L).getAs[Int]("r_score") shouldBe 5
    out(1L).getAs[Int]("r_score") should be < out(2L).getAs[Int]("r_score")
    // Cell is the 3-digit compose of the scores.
    out.values.foreach { r =>
      r.getAs[Int]("rfm_cell") shouldBe
        r.getAs[Int]("r_score") * 100 + r.getAs[Int]("f_score") * 10 +
          r.getAs[Int]("m_score")
    }
  }

  test("rfm: tied frequencies share f_score; bands within [1, k]") {
    val orders = df(orderSchema,
      (1L to 8L).flatMap { c =>
        // customers 1-4: 2 orders each; 5-8: 4 orders each
        val cnt = if (c <= 4) 2 else 4
        (1 to cnt).map(i => Row(c, day(i), 100.0 * c))
      }: _*)
    val out = Segmentation.rfm(orders).collect()
    val fScores = out.map(r =>
      r.getAs[Long]("customer") -> r.getAs[Int]("f_score")).toMap
    // All of 1-4 tie; all of 5-8 tie; the 4-order group bands higher.
    fScores.filterKeys(_ <= 4).values.toSet should have size 1
    fScores.filterKeys(_ > 4).values.toSet should have size 1
    fScores(1L) should be < fScores(5L)
    out.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        r.getAs[Int](c) should (be >= 1 and be <= 5)
      }
    }
    // Higher spend never bands lower (m monotone in monetary_cents).
    val byCents = out.sortBy(_.getAs[Long]("monetary_cents"))
      .map(_.getAs[Int]("m_score"))
    byCents shouldBe byCents.sorted
  }

  private def stump(rows: (Long, Boolean)*) = {
    import spark.implicits._
    Segmentation.stumpSplit(rows.toSeq.toDF("f", "y"), "f", "y")
      .collect().map(r => r.getAs[Long]("threshold") ->
        ((r.getAs[Long]("cost_milli"), r.getAs[Boolean]("is_best")))).toMap
  }

  test("stumpSplit: a perfectly separable feature reaches cost 0 at the split") {
    val out = stump((1L, true), (1L, true), (2L, false), (2L, false))
    out.keySet shouldBe Set(1L)              // all-left split excluded
    out(1L) shouldBe ((0L, true))
    // useless feature: split cost equals the unsplit impurity bound
    val flat = stump((1L, true), (1L, false), (2L, true), (2L, false))
    // S_L = S_R = 1+1 = 2 over n=2 each: cost = 4000 - 1000 - 1000
    flat(1L) shouldBe ((2000L, true))
  }

  test("stumpSplit: hand scan over three thresholds picks the argmin; ties break low") {
    // labels: f=1 -> T, f=2 -> T, f=3 -> F,F
    val out = stump((1L, true), (2L, true), (3L, false), (3L, false))
    // t=1: L(1,1) R(3,1): 4000 - 1000 - (1+4)*1000/3=1666 -> 1334
    out(1L)._1 shouldBe 1334L
    // t=2: L(2,2) R(2,0): perfect -> 0
    out(2L) shouldBe ((0L, true))
    out(1L)._2 shouldBe false
    out.keySet shouldBe Set(1L, 2L)
    // symmetric tie: costs equal at both thresholds -> lower flagged
    val tie = stump((1L, true), (2L, false), (3L, true))
    val bests = tie.filter(_._2._2)
    bests.keySet shouldBe Set(tie.filter(_._2._1 == bests.head._2._1)
      .keySet.min)
  }

  test("stumpSplit is invariant under input partitioning") {
    import spark.implicits._
    val rows = (1 to 300).map(i =>
      ((i * 37 % 23).toLong, i * 7919 % 97 < 40))
    val a = Segmentation.stumpSplit(rows.toDF("f", "y"), "f", "y")
      .orderBy("threshold").collect().map(_.toSeq)
    val b = Segmentation.stumpSplit(rows.toDF("f", "y").repartition(11),
      "f", "y").orderBy("threshold").collect().map(_.toSeq)
    a should contain theSameElementsInOrderAs b
    a.count(_.last.asInstanceOf[Boolean]) shouldBe 1
  }
}
