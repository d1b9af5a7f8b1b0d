package graft.quality

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def rated(pairs: (String, String)*) =
    pairs.toDF("rater_a", "rater_b")

  test("cohenKappa: hand-computed confusion — po 700, pe 500, kappa 400") {
    // cells: (x,x)=4 (x,y)=1 (y,y)=3 (y,x)=2 -> N=10, agree=7
    // marginals A: x5 y5; B: x6 y4 -> rc = 5*6 + 5*4 = 50
    // kappa = (0.7-0.5)/(1-0.5) = 0.400
    val d = rated(
      (Seq.fill(4)(("x", "x")) ++ Seq(("x", "y")) ++
        Seq.fill(3)(("y", "y")) ++ Seq.fill(2)(("y", "x"))): _*)
    val out = Agreement.cohenKappa(d, "rater_a", "rater_b")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    out shouldBe ((10L, 7L, 700L, 500L, Some(400L)))
  }

  test("cohenKappa: worse-than-chance kappa FLOORS on the negative side") {
    // (x,x)=1 (x,y)=3 (y,x)=1 -> N=5, agree=1; A: x4 y1; B: x2 y3
    // rc = 4*2 + 1*3 = 11; kappa = 1000*(5-11)/(25-11) = -6000/14
    // = -428.57... -> floor -429 (truncation toward zero says -428)
    val d = rated(("x", "x"), ("x", "y"), ("x", "y"), ("x", "y"), ("y", "x"))
    val out = Agreement.cohenKappa(d, "rater_a", "rater_b")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    out._5 shouldBe Some(-429L)
  }

  test("cohenKappa: degenerate single-label agreement -> kappa NULL, po 1000") {
    val d = rated(("x", "x"), ("x", "x"), ("x", "x"))
    val out = Agreement.cohenKappa(d, "rater_a", "rater_b")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    out shouldBe ((3L, 3L, 1000L, 1000L, None))
  }

  test("cohenKappa: null-labeled items are excluded, not disagreements") {
    val d = Seq(("x", Some("x")), ("y", None), ("y", Some("y")))
      .toDF("rater_a", "rater_b")
    val out = Agreement.cohenKappa(d, "rater_a", "rater_b")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    out._1 shouldBe 2L
    out._2 shouldBe 2L
  }

  test("cohenKappa is invariant under input partitioning") {
    val d = (1 to 200).map(i =>
      (s"l${i % 4}", s"l${(if (i % 13 == 0) i + 1 else i) % 4}"))
      .toDF("rater_a", "rater_b")
    assertSameRows(
      Agreement.cohenKappa(d, "rater_a", "rater_b"),
      Agreement.cohenKappa(d.repartition(7), "rater_a", "rater_b"))
  }
}
