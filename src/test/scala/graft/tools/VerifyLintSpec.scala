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

  test("nested decimals inside structs are out of lint scope (top-level only)") {
    // the driver hashes the stringified TOP-LEVEL cells; registry
    // queries emit flat schemas, so the lint checks top-level fields —
    // this pin documents that boundary
    val nested = Seq((1L, ("x", BigDecimal(1.5))))
      .toDF("k", "s")
    noException should be thrownBy Verify.lintNoDecimalOutput("q_test", nested)
  }
}
