package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation for tabular training data — the
  * fill-before-model pass every feature pipeline runs. Group-wise
  * LOWER median (the element at sorted position `(n+1) DIV 2` of the
  * non-null values): an actual observed value, exact under integer
  * axes, and identical in every engine — unlike the interpolated
  * median, which fabricates a value on even counts and drags in
  * float division (the determinism rules that govern this repo).
  *
  * Null policy is explicit and conservative: a group whose values are
  * ALL null has no median — its rows stay null with
  * `was_imputed = false` (imputing from nothing would be fabrication;
  * the gap stays visible for the E62-style gate to catch). Imputed
  * rows are flagged so downstream weighting/auditing can tell
  * observed from filled — the flag IS the operator's audit trail.
  *
  * Shape at scale: medians need a per-group sort — ONE window over
  * (keys, value) on the non-null subset (row_number + count share the
  * sort), one filter to the median row, then one keys-keyed join
  * back. The median frame is one row per group (broadcast-scale for
  * bounded group universes); the data moves through exactly one
  * exchange. No collect, no UDF.
  */
object Impute {

  /** Returns `df` + `<valueCol>_filled` + `was_imputed`, keyed by
    * `keys`. `valueCol` should be integral for exact medians (the
    * micros/permille discipline); doubles work but inherit double
    * compare semantics. */
  def imputeMedian(df: DataFrame, keys: Seq[String],
                   valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val med = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(keys.map(col) :+ col(valueCol).as("__med"): _*)
    df.join(med, keys, "left")
      .withColumn(s"${valueCol}_filled",
        coalesce(col(valueCol), col("__med")))
      .withColumn("was_imputed",
        col(valueCol).isNull && col("__med").isNotNull)
      .drop("__med")
  }
}
