package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def docs(rows: (Long, String)*) =
    df(docsSchema, rows.map { case (i, t) => Row(i, t) }: _*)

  // corpus counts: a=4, b=3, c=2, z=1 -> ranks a=1, b=2, c=3, z=4
  private val corpus = docs(
    1L -> "a a b c",
    2L -> "a b z",
    3L -> "a b c")

  test("tokenRanks orders by count desc with token tie-break") {
    val ranks = Vocab.tokenRanks(corpus)
      .select("token", "rank").as[(String, Int)].collect().toMap
    ranks shouldBe Map("a" -> 1, "b" -> 2, "c" -> 3, "z" -> 4)
  }

  test("docRankProfile computes instance-weighted mean rank") {
    val out = Vocab.docRankProfile(corpus)
      .select("doc_id", "n_tokens", "n_types", "rank_sum", "rarest_rank", "mean_rank")
      .as[(Long, Long, Long, Long, Int, Double)].collect().sortBy(_._1)
    // doc 1: ranks 1,1,2,3 -> sum 7, mean 1.75, rarest 3
    out(0) shouldBe ((1L, 4L, 3L, 7L, 3, 1.75))
    // doc 2: ranks 1,2,4 -> sum 7, rarest 4
    out(1)._4 shouldBe 7L
    out(1)._5 shouldBe 4
  }

  test("oovProfile counts instances outside the top-k vocab") {
    // vocab of 2 = {a, b}; doc 1 has one OOV instance (c), doc 2 one (z)
    val out = Vocab.oovProfile(corpus, vocabSize = 2)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 4L, 1L, 0.25))
    out(1) shouldBe ((2L, 3L, 1L, 1.0 / 3.0))
    out(2) shouldBe ((3L, 3L, 1L, 1.0 / 3.0))
  }

  test("oov vocab side is broadcast") {
    val plan = Vocab.oovProfile(corpus, vocabSize = 2)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  private val langSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  test("heapsCurve: cumulative types via first appearance, per group, exact") {
    // en docs in doc_id order: "a b", "a c", "a a", "d" ⇒ with k=2
    // buckets {1,2},{3,4}: cum after b1 = (2 docs, 4 toks, 3 types),
    // after b2 = (4 docs, 7 toks, 4 types — only d is new)
    val d = df(langSchema,
      Row(1L, "en", "a b"), Row(2L, "en", "a c"),
      Row(3L, "en", "a a"), Row(4L, "en", "d"),
      Row(5L, "fr", "x x y"), Row(6L, "fr", "x"))
    val out = Vocab.heapsCurve(d, k = 2).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("bucket")) ->
        (r.getAs[Long]("cum_docs"), r.getAs[Long]("cum_tokens"),
         r.getAs[Long]("cum_types"))).toMap
    out(("en", 1)) shouldBe ((2L, 4L, 3L))
    out(("en", 2)) shouldBe ((4L, 7L, 4L))
    out(("fr", 1)) shouldBe ((1L, 3L, 2L))
    out(("fr", 2)) shouldBe ((2L, 4L, 2L)) // x repeats: no new type
  }

  test("heapsCurve: final checkpoint equals the corpus totals; invariant") {
    val d = df(langSchema, (1 to 30).map(i =>
      Row(i.toLong, "en", s"w${i % 7} w${i % 3} common")): _*)
    val out = Vocab.heapsCurve(d, k = 5).filter($"bucket" === 5).collect().head
    out.getAs[Long]("cum_docs") shouldBe 30L
    out.getAs[Long]("cum_tokens") shouldBe 90L
    out.getAs[Long]("cum_types") shouldBe 8L // w0..w6 + common
    assertSameRows(Vocab.heapsCurve(d, k = 5),
      Vocab.heapsCurve(d.repartition(7), k = 5))
  }

  test("heapsCurve: cum_types is monotone and never exceeds cum_tokens") {
    val d = df(langSchema, (1 to 20).map(i =>
      Row(i.toLong, if (i % 2 == 0) "en" else "fr", s"t$i t${i / 2}")): _*)
    val rows = Vocab.heapsCurve(d, k = 4)
      .orderBy($"lang", $"bucket").collect()
    rows.groupBy(_.getAs[String]("lang")).values.foreach { g =>
      val types = g.map(_.getAs[Long]("cum_types"))
      types.toSeq shouldBe types.sorted.toSeq
      g.foreach { r =>
        r.getAs[Long]("cum_types") should be <= r.getAs[Long]("cum_tokens")
      }
    }
  }
test("vocabTrend: rank deltas against the previous batch; new entrants flagged") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "beta beta beta alpha gamma gamma delta"))
      .toDF("batch", "text")
    val out = Vocab.vocabTrend(d, "batch", k = 4)
      .select("batch", "rank", "token", "cnt", "rank_delta", "is_new")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    // batch 1 ranks: alpha(3)=1, beta(2)=2, gamma(1)=3 — no previous
    out.filter(_._1 == 1L).map(r => (r._2, r._3, r._5, r._6)) shouldBe
      Set((1L, "alpha", None, true), (2L, "beta", None, true),
        (3L, "gamma", None, true))
    // batch 2: beta(3)=1 (+1), gamma(2)=2 (+1), alpha(1)=3 (-2),
    // delta(1)=4 new (ties by token: alpha < delta)
    out.filter(_._1 == 2L).map(r => (r._2, r._3, r._5, r._6)) shouldBe
      Set((1L, "beta", Some(1L), false), (2L, "gamma", Some(1L), false),
        (3L, "alpha", Some(-2L), false), (4L, "delta", None, true))
  }

  test("vocabTrend: crossing back INTO the top-k is movement, not novelty") {
    import spark.implicits._
    // batch 1: zz ranks 3 (outside k=2); batch 2: zz rises to rank 1
    val d = Seq(
      (1L, "aa aa aa bb bb zz"),
      (2L, "zz zz zz aa aa bb"))
      .toDF("batch", "text")
    val out = Vocab.vocabTrend(d, "batch", k = 2)
      .filter($"batch" === 2 && $"token" === "zz")
      .select("rank", "prev_rank", "is_new")
      .as[(Long, Option[Long], Boolean)].head()
    out shouldBe ((1L, Some(3L), false)) // moved +2, NOT new
  }

  test("vocabTrend is invariant under input partitioning") {
    import spark.implicits._
    val d = (1 to 80).map(i =>
      ((i % 4).toLong + 1, s"w${i % 11} w${(i * 3) % 11} w${(i * 7) % 13}"))
      .toDF("batch", "text")
    assertSameRows(Vocab.vocabTrend(d, "batch", k = 5),
      Vocab.vocabTrend(d.repartition(7), "batch", k = 5))
  }

  test("goodTuringCounts: hand counts-of-counts, raw Turing estimate, gaps, unseen mass") {
    import spark.implicits._
    // corpus: a a a b b c d -> N1=2 (c,d), N2=1 (b), N3=1 (a); N=7
    val d = Seq((1L, "a a a b b c d")).toDF("doc_id", "text")
    val out = Vocab.goodTuringCounts(d).orderBy("r").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
    out shouldBe Array(
      (1L, 2L, 1000000L, 285L),  // r*=2*N2/N1 = 1 exactly
      (2L, 1L, 3000000L, 285L),  // r*=3*N3/N2 = 3
      (3L, 1L, -1L, 285L))       // N4=0 -> NULL gap (simple GT's job)
    // p0 = N1*1000 div N = 2000 div 7 = 285
  }

  test("chao1Richness: hand estimate, N2=0 totality, invariance") {
    import spark.implicits._
    // a a a b b c d: S=4, N1=2, N2=1 -> chao1 = 4 + 2*1/(2*2) = 4.5
    val d = Seq((1L, "a a a b b c d")).toDF("doc_id", "text")
    val r = Vocab.chao1Richness(d).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
      ((4L, 2L, 1L, 7L, 4500000L))
    // all-hapax corpus (N2 = 0): the bias-corrected form stays total
    val h = Seq((1L, "w x y z")).toDF("doc_id", "text")
    val rh = Vocab.chao1Richness(h).collect().head
    rh.getLong(4) shouldBe (4L * 1000000L + 4L * 3L * 1000000L / 2L) // 4 + 4*3/2 = 10
    val big = (1L to 50L).map(i => (i, s"w${i % 9} u$i v${i % 4}")).toDF("doc_id", "text")
    assertSameRows(Vocab.chao1Richness(big), Vocab.chao1Richness(big.repartition(7)))
  }

  test("goodTuringCounts: mass conservation and invariance under partitioning") {
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 13} w${i % 3} tail$i"))
      .toDF("doc_id", "text")
    val a = Vocab.goodTuringCounts(d)
    assertSameRows(a, Vocab.goodTuringCounts(d.repartition(7)))
    // sanity: sum r*N_r equals the corpus token count (4 per doc)
    val total = a.selectExpr("sum(r * n_r)").head.getLong(0)
    total shouldBe 160L
  }
}
