package graft.tools

import graft.{SparkSpec, Verify}
import org.apache.spark.sql.functions._

/** Pins the Verify-side decimal-output lint (the q304 trap): any
  * registry query whose output schema carries DecimalType must fail
  * fast at dump time with the cast-to-DOUBLE rule in the message —
  * not surface later as an inexplicable driver hash mismatch. */
class VerifyLintSpec extends SparkSpec {
  import spark.implicits._

  test("a DecimalType output column is refused with the documented rule") {
    val bad = Seq(("A", "1.5")).toDF("k", "v")
      .withColumn("v", col("v").cast("decimal(18,6)"))
    val e = intercept[IllegalStateException] {
      Verify.lintNoDecimalOutput("q_test", bad)
    }
    e.getMessage should include("v")
    e.getMessage should include("DOUBLE")
  }

  test("double and bigint outputs pass the lint") {
    val ok = Seq(("A", 1.5, 2L)).toDF("k", "v", "n")
    noException should be thrownBy Verify.lintNoDecimalOutput("q_test", ok)
  }

  test("nested decimals inside structs/arrays/maps are refused too") {
    // the driver stringifies WHOLE top-level cells, so a decimal buried
    // in a struct/array/map produces the same cross-engine repr
    // mismatch as a top-level one — the lint recurses (round-16 fix;
    // pre-16 this boundary was top-level only and a nested decimal
    // escaped to the round artifact as a puzzling hash mismatch)
    val nested = Seq((1L, ("x", BigDecimal(1.5)))).toDF("k", "s")
    intercept[IllegalStateException] {
      Verify.lintNoDecimalOutput("q_test", nested)
    }.getMessage should include("s")
    val arr = Seq((1L, Seq(BigDecimal(1.5)))).toDF("k", "a")
    intercept[IllegalStateException] {
      Verify.lintNoDecimalOutput("q_test", arr)
    }.getMessage should include("a")
    val mp = Seq((1L, Map("x" -> BigDecimal(1.5)))).toDF("k", "m")
    intercept[IllegalStateException] {
      Verify.lintNoDecimalOutput("q_test", mp)
    }.getMessage should include("m")
    // non-decimal nested types still pass
    val okNested = Seq((1L, ("x", 1.5), Seq(2L))).toDF("k", "s", "a")
    noException should be thrownBy Verify.lintNoDecimalOutput("q_test", okNested)
  }
}
