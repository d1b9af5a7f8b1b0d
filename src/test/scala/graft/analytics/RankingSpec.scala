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
}
