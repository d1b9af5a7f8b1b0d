package graft.core

import org.apache.spark.sql.DataFrame

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
}
