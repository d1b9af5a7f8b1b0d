package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions.{sum, when}

/** Round barrier for iterative dataframe algorithms (label
  * propagation, frontier relaxation, closure squaring, fixpoints).
  *
  * `localCheckpoint()` alone cuts LINEAGE but not the STATS feedback:
  * the checkpointed `LogicalRDD` leaf inherits the origin plan's
  * ESTIMATED `sizeInBytes`, and Catalyst's size-only estimator
  * multiplies child sizes through joins and unions — so when round
  * k+1's plan contains round k's leaf two or three times (a self-join
  * or a multi-branch union, the normal shape of a fixpoint round),
  * the estimate's DIGIT COUNT doubles or triples per round. Measured
  * on a constant-size 100-row fixpoint: 6 → 12 → 22 → … → 11,172
  * digits by round 12 with plain localCheckpoint. By round ~15 the
  * driver is single-threadedly multiplying million-digit BigIntegers
  * inside stats estimation — the job looks "hung" at 100% driver CPU
  * while every executor idles (caught live on q255's entity-resolution
  * components at sf0.1: componentLabels' 3-branch union tripled digits
  * per round and the per-round checkpoint itself stalled in
  * `LogicalRDD.fromDataset` → `stats`).
  *
  * `barrier` materializes the round AND rebuilds the frame from the
  * checkpointed RDD (the public GraphFrames connected-components
  * device), so the new leaf's statistics reset to the session default
  * every round — measured flat at 19 digits over the same 12 rounds.
  * The reset makes the leaf's size estimate conservative (never
  * broadcast), which is the correct default for a fixpoint's state
  * frame anyway: at scale the label/distance table is the BIG side.
  * Frames checkpointed ONCE outside a loop (edge lists, inputs) should
  * keep plain `localCheckpoint()` — their real estimates stay useful
  * and nothing compounds. The row re-encoding this adds is linear in
  * the (node-sized, narrow) state frame — noise next to the shuffle
  * each round already pays. */
object Iterate {

  def barrier(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** [[barrier]] plus a changed-row count collected DURING the
    * checkpoint's own materialization action — the fixpoint loops'
    * convergence check for free. Plain `barrier` + a separate
    * `filter(changed).isEmpty` costs a second job per round (cheap —
    * it scans the materialized RDD — but a full driver↔cluster round
    * trip each iteration). Here the count rides the eager
    * localCheckpoint as an `observe` metric (`CollectMetrics` — Spark's
    * exactly-once accumulator path, immune to the task-retry
    * double-count a raw LongAccumulator risks), so one action yields
    * both the materialized round and its convergence signal.
    *
    * Metric delivery is asynchronous (QueryExecutionListener), so the
    * read polls briefly; if the listener has not fired within the
    * bound (never observed — a defensive branch only), the count
    * falls back to one extra job over the already-checkpointed RDD,
    * which is exactly the old two-action behavior: correctness never
    * depends on the fast path. */
  def barrierCounted(df: DataFrame, changed: Column): (DataFrame, Long) = {
    val obs = Observation()
    val cp = df.observe(obs,
      sum(when(changed, 1L).otherwise(0L)).as("n_changed")).localCheckpoint()
    val out = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    val row =
      try Some(scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(10, "s")))
      catch { case _: java.util.concurrent.TimeoutException => None }
    val n = row match {
      case Some(r) if !r.isNullAt(r.fieldIndex("n_changed")) =>
        r.getAs[Number]("n_changed").longValue()
      case Some(_) => 0L // empty input: sum over zero rows is null
      case None => out.filter(changed).count() // defensive fallback
    }
    (out, n)
  }
}
