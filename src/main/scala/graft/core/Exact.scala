package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for cross-engine (Spark vs DuckDB oracle)
  * bit-exact aggregation.
  *
  * Raw double sums/averages are summation-order-dependent: Spark's
  * partial/final aggregation merges partials in arrival order, so even
  * two Spark runs can differ in the last ulps — and a single-threaded
  * DuckDB run certainly will. Decimal sums are exact and
  * order-independent, so every oracle-checked aggregate over doubles
  * goes through a decimal cast at a fixed scale. At 100 TB this also
  * protects against silent precision collapse in long sums
  * (catastrophic cancellation is impossible in fixed-point).
  */
object Exact {

  /** Order-independent sum: exact decimal accumulation, result as
    * double (decimal→double conversion is correctly rounded in both
    * engines while |sum·10^scale| < 2^53·…; scale 4 + 18 digits covers
    * 100 TB-scale partial sums when the final reduce is decimal too). */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** Order-independent average: exact decimal sum / non-null count,
    * both sides cast to double before dividing so Spark and the oracle
    * perform the identical IEEE-754 division. */
  def exactAvg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double") / count(c).cast("double")

  /** Decimal sum kept as decimal (for outputs compared as decimals). */
  def decSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale)))
}
