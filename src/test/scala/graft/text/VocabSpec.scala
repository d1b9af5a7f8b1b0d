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
}
