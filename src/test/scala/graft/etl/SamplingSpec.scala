package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 300L)
    .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    .toDF("doc_id", "lang")

  test("hashSample is a pure function of values: partitioning-invariant") {
    val a = Sampling.hashSample(docs, "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    a shouldBe b
    a.size should (be > 30 and be < 90) // ~60 expected at rate 5
  }

  test("hashSample membership never flips as unrelated rows arrive") {
    val early = Sampling.hashSample(docs.filter(col("doc_id") <= 150), "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    val late = Sampling.hashSample(docs, "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    early shouldBe late.filter(_ <= 150)
  }

  test("stratifiedSample returns exactly k per stratum, deterministically") {
    val s = Sampling.stratifiedSample(docs, "lang", "doc_id", k = 10)
    s.groupBy("lang").count().as[(String, Long)].collect().toMap shouldBe
      Map("en" -> 10L, "de" -> 10L, "fr" -> 10L)
    val again = Sampling.stratifiedSample(docs.repartition(5), "lang", "doc_id", k = 10)
    assertSameRows(s, again)
  }
}
