package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles sort-merge
  * splits at runtime; these are for the cases it does not reach —
  * a hot key whose rows must still co-locate for a downstream
  * aggregation, or a shuffled join where one key dominates a reducer.
  *
  * Semantics contract: salting NEVER changes results — it only
  * re-partitions work. Both helpers are verified against unsalted
  * plans in the suite and against the SQL oracle (q34).
  */
object Skew {

  /** Salted equi-join for skewed LEFT keys: left rows spread across
    * `buckets` sub-keys via `saltExpr` (any deterministic per-row
    * expression — a row id, a hash of non-key columns); the right side
    * replicates `buckets`× so every sub-key finds its match. Right
    * replication costs |right|·buckets — use for small-to-medium right
    * sides where broadcast is not possible (or the join output feeds a
    * co-partitioned aggregation).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltExpr: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = left.withColumn("__salt", pmod(saltExpr, lit(buckets)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation under an explicit salt: phase 1 aggregates
    * on (keys, salt) so a hot key's rows split across reducers, phase
    * 2 merges the algebraic partials. Useful where map-side combine
    * cannot collapse enough (very wide rows, extreme single-key skew).
    * Emits sum (exact decimal), count, min, max of `valueCol`. */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  saltExpr: Column, buckets: Int, sumScale: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val partial = df
      .withColumn("__salt", pmod(saltExpr, lit(buckets)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(38, sumScale))).as("__sum"),
        count(col(valueCol)).as("__cnt"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
    partial.groupBy(keys.map(col): _*)
      .agg(
        sum(col("__sum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__cnt")).as(s"count_$valueCol"),
        min(col("__min")).as(s"min_$valueCol"),
        max(col("__max")).as(s"max_$valueCol"))
  }
}
