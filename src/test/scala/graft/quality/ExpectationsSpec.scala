package graft.quality

import graft.SparkSpec
import graft.quality.Expectations.Expectation

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def d = Seq(
    (Some(1L), Some("a"), 10.0, "OK"),
    (Some(2L), Some("b"), -5.0, "OK"),
    (Some(2L), None, 300.0, "BAD!"),       // dup id, null name
    (None, Some("c"), 50.0, "meh"))
    .toDF("id", "name", "price", "status")

  test("each kind counts its violations exactly") {
    val out = Expectations.runExpectations(d, Seq(
        Expectation("id_unique", "unique", "id"),
        Expectation("id_not_null", "not_null", "id"),
        Expectation("name_not_null", "not_null", "name"),
        Expectation("price_min", "min", "price", "0.0"),
        Expectation("price_max", "max", "price", "100.0"),
        Expectation("status_vals", "accepted_values", "status", "OK,meh"),
        Expectation("status_fmt", "rlike", "status", "^[a-zA-Z]+$")))
      .as[(String, String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    out("id_unique") shouldBe ((1L, false))     // one duplicated non-null id
    out("id_not_null") shouldBe ((1L, false))
    out("name_not_null") shouldBe ((1L, false))
    out("price_min") shouldBe ((1L, false))     // -5.0
    out("price_max") shouldBe ((1L, false))     // 300.0
    out("status_vals") shouldBe ((1L, false))   // BAD!
    out("status_fmt") shouldBe ((1L, false))    // "BAD!" fails the regex
  }

  test("a clean table passes everything; unknown kinds refuse loudly") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    val out = Expectations.runExpectations(clean, Seq(
        Expectation("u", "unique", "id"),
        Expectation("n", "not_null", "name")))
      .as[(String, String, String, Long, Boolean)].collect()
    all(out.map(_._4)) shouldBe 0L
    all(out.map(_._5)) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      Expectations.runExpectations(clean, Seq(Expectation("z", "nope", "id")))
  }
}
