package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * it scans the materialized RDD — but a full plan-compile +
    * driver↔cluster round trip each iteration). Here the count rides
    * the eager localCheckpoint as an `observe` metric
    * (`CollectMetrics` — Spark's exactly-once accumulator path,
    * immune to the task-retry double-count a raw LongAccumulator
    * risks), so one action yields both the materialized round and its
    * convergence signal.
    *
    * The metric is read SYNCHRONOUSLY from the observed frame's own
    * `queryExecution.observedMetrics` — accumulator updates are
    * applied before the materializing action returns, so the value is
    * ready the moment localCheckpoint comes back. (The previous
    * listener-based read — `Observation.future` + Await — waited on
    * the async QueryExecutionListener bus and measured +25 ms/round
    * of pure delivery latency across this repo's ~50-round fixpoint
    * queries, r19.) If the metric is ever absent (defensive branch
    * only — never observed), the count falls back to one extra job
    * over the already-checkpointed RDD, the old two-action behavior:
    * correctness never depends on the fast path. */
  def barrierCounted(df: DataFrame, changed: Column): (DataFrame, Long) = {
    val name = "__n_changed_" + java.util.UUID.randomUUID().toString
    val obsDf = df.observe(name,
      sum(when(changed, 1L).otherwise(0L)).as("n_changed"))
    val cp = obsDf.localCheckpoint()
    val out = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    val n = obsDf.queryExecution.observedMetrics.get(name) match {
      case Some(r) if !r.isNullAt(r.fieldIndex("n_changed")) =>
        r.getAs[Number]("n_changed").longValue()
      case Some(_) => 0L // empty input: sum over zero rows is null
      case None => out.filter(changed).count() // defensive fallback
    }
    (out, n)
  }

  /** Scale-adaptive AQE gate for fixpoint loops (guide §2: derive
    * settings from input size, never from the cluster shape). AQE
    * re-plans every exchange as its own query-stage job; on a BIG
    * round that buys skew splitting and partition coalescing, but a
    * fixpoint round whose state is TINY (a few thousand labels —
    * either a small fixture or the geometrically shrinking tail of a
    * big run's peel/convergence phase) gets nothing back: the stages
    * it would adapt are already single-partition-sized, while the
    * per-stage submission overhead was measured at ~120 ms/round
    * (local[4], 3-exchange round, r19). `body` runs with AQE off iff
    * the measured row count of the loop state is below the floor —
    * a DATA property, so the same code keeps AQE on for the big
    * early rounds at warehouse scale and sheds it exactly when the
    * loop outlives its data. The floor (rows whose shuffle bytes sit
    * well under one advisory AQE partition) can be overridden via
    * `spark.graft.iterate.aqeRowFloor`. The previous setting is restored
    * on every exit path; loops run the gate per call, so a loop that
    * GROWS past the floor re-enables AQE on its next call. */
  def withAqeGate[T](spark: SparkSession, stateRows: Long)(body: => T): T = {
    val floor = spark.conf.getOption("spark.graft.iterate.aqeRowFloor")
      .map(_.toLong).getOrElse(1000000L)
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    if (stateRows >= floor || prev == "false") body
    else try { spark.conf.set(key, "false"); body }
    finally spark.conf.set(key, prev)
  }
}
