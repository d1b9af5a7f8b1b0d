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

  test("chiSquare: perfect dependence gives chi2 = N and V2 = 1; uniform independence gives 0") {
    val dep = ((1 to 50).map(_ => ("x", "x")) ++ (1 to 50).map(_ => ("y", "y")))
      .toDF("a", "b")
    val r = Agreement.chiSquare(dep, "a", "b").collect().head
    r.getLong(0) shouldBe 100L
    r.getLong(4) shouldBe 100000000L   // chi2_e6 = N * 1e6
    r.getLong(5) shouldBe 1000L        // V^2 = 1
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25 }
      yield (a, b)).toDF("a", "b")
    val i = Agreement.chiSquare(ind, "a", "b").collect().head
    i.getLong(4) shouldBe 0L
    i.getLong(5) shouldBe 0L
  }

  test("chiSquare: hand-computed 2x2 with per-cell e6 floors") {
    // counts: (x,u)=10 (x,v)=20 (y,u)=30 (y,v)=40
    val d = (Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(40)(("y", "v"))).toDF("a", "b")
    val r = Agreement.chiSquare(d, "a", "b").collect().head
    r.getLong(3) shouldBe 1L           // dof
    r.getLong(4) shouldBe 793650L      // 8333333+22222222+32142857+38095238 - 1e8
    r.getLong(5) shouldBe 7L
  }

  test("chiSquare: a constant column yields chi2 0 and NULL V2 (undefined, not 0)") {
    val d = Seq(("x", "k"), ("y", "k"), ("y", "k")).toDF("a", "b")
    val r = Agreement.chiSquare(d, "a", "b").collect().head
    r.getLong(3) shouldBe 0L
    r.getLong(4) shouldBe 0L
    r.isNullAt(5) shouldBe true
  }

  test("chiSquare is invariant under input partitioning") {
    val d = (1 to 300).map(i => (s"a${i % 5}", s"b${(i * 7 + i * i) % 4}"))
      .toDF("a", "b")
    assertSameRows(Agreement.chiSquare(d, "a", "b"),
      Agreement.chiSquare(d.repartition(9), "a", "b"))
  }

  /** Expand a per-item category-count table into (item, label) rating
    * rows. */
  private def panel(counts: Seq[Seq[Int]]) =
    counts.zipWithIndex.flatMap { case (row, i) =>
      row.zipWithIndex.flatMap { case (c, k) =>
        Seq.fill(c)((s"item$i", s"cat$k"))
      }
    }.toDF("item", "label")

  test("fleissKappa: the Fleiss 1971 worked table lands on the textbook kappa") {
    // 10 subjects x 14 raters x 5 categories (Fleiss 1971, Table 1);
    // published kappa ~= 0.210 (P-bar 0.378, Pe 0.213)
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val out = Agreement.fleissKappa(panel(table), "item", "label")
      .collect().head
    out.getLong(0) shouldBe 10L  // n_items
    out.getLong(1) shouldBe 14L  // n_raters
    out.getLong(2) shouldBe 5L   // n_labels
    // exact integer replication of the operator's identity
    val a = BigInt(table.flatten.map(n => n * (n - 1)).sum)
    val cks = (0 until 5).map(k => table.map(_(k)).sum)
    val b = cks.map(c => BigInt(c) * c).sum
    val dD = BigInt(10) * 14 * 13
    val e = BigInt(140) * 140
    val num = BigInt(1000000) * (a * e - b * dD)
    val den = dD * (e - b)
    val expected = ((num - (num % den + den) % den) / den).toLong
    out.getLong(5) shouldBe expected
    expected should (be >= 209000L and be <= 211000L) // literature 0.210
  }

  test("fleissKappa: perfect agreement is exactly 1e6; single-label panel is NULL") {
    val perfect = panel(Seq(Seq(3, 0), Seq(0, 3), Seq(3, 0)))
    Agreement.fleissKappa(perfect, "item", "label")
      .collect().head.getLong(5) shouldBe 1000000L
    val mono = panel(Seq(Seq(3), Seq(3)))
    Agreement.fleissKappa(mono, "item", "label")
      .collect().head.isNullAt(5) shouldBe true
  }

  test("fleissKappa: below-chance disagreement goes NEGATIVE (the floor trap)") {
    // 2 raters, 2 items, perfectly anti-correlated labels
    val anti = panel(Seq(Seq(1, 1), Seq(1, 1)))
    val k = Agreement.fleissKappa(anti, "item", "label")
      .collect().head.getLong(5)
    k should be < 0L
  }

  test("fleissKappa: ragged and single-rater panels are refused loudly") {
    an[IllegalArgumentException] should be thrownBy
      Agreement.fleissKappa(panel(Seq(Seq(2, 1), Seq(1, 0))), "item", "label")
    an[IllegalArgumentException] should be thrownBy
      Agreement.fleissKappa(panel(Seq(Seq(1), Seq(1))), "item", "label")
  }

  test("fleissKappa is invariant under input partitioning") {
    val d = panel((0 until 30).map(i =>
      Seq(i % 4, 3 - i % 4, 2, 1)))
    assertSameRows(Agreement.fleissKappa(d, "item", "label"),
      Agreement.fleissKappa(d.repartition(7), "item", "label"))
  }
}
