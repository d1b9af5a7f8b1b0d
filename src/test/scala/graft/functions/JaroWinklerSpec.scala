package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinklerFunctions.jaroWinklerE6(col("a"), col("b")))
      .as[Long].head()

  test("textbook pairs land on the exact rational floors") {
    // MARTHA/MARHTA: m=6, t2=2, l=3 -> 12456/12960
    jw("MARTHA", "MARHTA") shouldBe 961111L
    // DIXON/DICKSONX: m=4, t2=0, l=2 -> 7808/9600 (Winkler's own example)
    jw("DIXON", "DICKSONX") shouldBe 813333L
  }

  test("identity, disjoint, and empty conventions") {
    jw("graft", "graft") shouldBe 1000000L
    jw("abc", "xyz") shouldBe 0L        // no matches
    jw("", "") shouldBe 1000000L        // both empty compare equal, stated
    jw("", "abc") shouldBe 0L
  }

  test("the unconditional prefix boost and symmetry") {
    // same Jaro, different prefix: boost strictly orders them
    val withPrefix = jw("prefixab", "prefixba")
    val noPrefix = jw("abprefix", "baprefix")
    withPrefix should be > noPrefix
    // symmetric by construction
    jw("DWAYNE", "DUANE") shouldBe jw("DUANE", "DWAYNE")
    jw("DWAYNE", "DUANE") shouldBe 840000L  // m=4, t2=0, l=1: exact
  }

  test("supplementary-plane codepoints count as single characters") {
    // U+1F600 is two UTF-16 units; codepoint arithmetic must see one
    jw("😀ab", "😀ab") shouldBe 1000000L
  }

  test("stays inside whole-stage codegen (no UDF, no boxing)") {
    // repartition blocks ConvertToLocalRelation from evaluating the
    // projection at plan time (which would leave only a LocalTableScan)
    val df = Seq(("martha", "marhta")).toDF("a", "b").repartition(1)
      .select(JaroWinklerFunctions.jaroWinklerE6(col("a"), col("b")).as("s"))
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the simple plan string
    plan should include("*(1) Project [jaro_winkler_e6")
    plan should not include "BatchEvalPython"
  }
}
