package graft.etl

import graft.SparkSpec

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("looEncode: each row's own target is excluded; floor on the remainder") {
    val d = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 41L),
        (4L, "b", 7L))
      .toDF("id", "cat", "t")
    val out = Encoding.looEncode(d, "cat", "t")
      .select("id", "loo_t").as[(Long, Option[Long])].collect().toMap
    out(1L) shouldBe Some(30L) // (71-10)/2 = 30.5 -> 30
    out(2L) shouldBe Some(25L) // (71-20)/2 = 25.5 -> 25
    out(3L) shouldBe Some(15L) // (71-41)/2 = 15
    out(4L) shouldBe None      // singleton: no leave-one-out evidence
  }

  test("looEncode: identical targets encode to the shared value") {
    val d = Seq((1L, "a", 9L), (2L, "a", 9L), (3L, "a", 9L))
      .toDF("id", "cat", "t")
    Encoding.looEncode(d, "cat", "t")
      .select("loo_t").as[Long].collect().toSeq shouldBe Seq(9L, 9L, 9L)
  }

  test("looEncode is invariant under input partitioning") {
    val d = (1 to 120).map(i => (i.toLong, s"c${i % 7}", (i * 31 % 997).toLong))
      .toDF("id", "cat", "t")
    assertSameRows(
      Encoding.looEncode(d, "cat", "t"),
      Encoding.looEncode(d.repartition(5), "cat", "t"))
  }
}
