package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy (parent-child dimension) aggregation — the OLAP rollup
  * a FLAT `GROUP BY` cannot express: org charts, category trees,
  * bill-of-materials, geo containment all ship as (node, parent)
  * edges, and the question is per-node SUBTREE totals ("sales under
  * this category, all depths"), not per-level slices (E31's ROLLUP
  * handles the fixed-column case; this handles the recursive one).
  *
  * Algorithm: materialize the ancestor–descendant closure by
  * SQUARING (pointer doubling on paths — the E27/E188 device at the
  * pair level): start from the parent edges (distance 1) and union
  * P ∘ P each round, so covered distance doubles — a depth-d
  * hierarchy closes in ⌈log₂ d⌉ self-joins, not d. Then one join of
  * measures onto descendants and one ancestor-keyed aggregate.
  *
  * State bound, stated honestly: the closure holds Σ_v depth(v)
  * pairs — linear×depth, fine for real hierarchies (org charts,
  * product taxonomies: depth ≤ tens), NOT for path-shaped graphs
  * pretending to be hierarchies. Convergence is count-stability
  * (closure growth is monotone and finite). Two loud failure modes,
  * never wrong output (the componentLabels contract): depth beyond
  * 2^maxRounds throws at the cap, and a CYCLE — whose closure is
  * finite and would otherwise converge to nonsense totals counting
  * every cycle member as its own descendant — is detected directly
  * as a node that is its own PROPER ancestor and refused.
  *
  * Output per node: own measure, subtree count/total (self
  * included), and exact share-of-parent permille (subtree_total ·
  * 1000 div parent's subtree_total — NULL at roots, where the share
  * is undefined). */
object Hierarchy {

  def subtreeRollup(df: DataFrame, nodeCol: String, parentCol: String,
                    measureCol: String, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val nodes = df.select(col(nodeCol).as("node"),
      col(parentCol).as("parent"),
      col(measureCol).cast("long").as("own"))
    var p = graft.core.Iterate.barrier(nodes.filter(col("parent").isNotNull)
      .select(col("parent").as("anc"), col("node").as("des"))
      .distinct())
    var size = p.count()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      // barrier, not plain localCheckpoint: p appears three times in
      // this round's plan — the stats-feedback reset of
      // [[graft.core.Iterate]] keeps estimate digits flat
      val next = graft.core.Iterate.barrier(p.union(
          p.select(col("anc"), col("des").as("__mid"))
            .join(p.select(col("anc").as("__mid"), col("des")), "__mid")
            .select(col("anc"), col("des")))
        .distinct())
      val nextSize = next.count()
      if (nextSize == size) done = true
      else { p = next; size = nextSize }
    }
    if (!done) throw new IllegalStateException(
      s"subtreeRollup closure still growing after $maxRounds squaring " +
        "rounds (depth over 2^rounds); refusing to emit wrong totals")
    if (!p.filter(col("anc") === col("des")).isEmpty)
      throw new IllegalStateException(
        "subtreeRollup: cycle detected (a node is its own proper " +
          "ancestor) — a cyclic parent relation has no subtree semantics")
    val withSelf = p.union(nodes.select(col("node").as("anc"),
      col("node").as("des")))
    val agg = withSelf
      .join(nodes.select(col("node").as("des"), col("own")), "des")
      .groupBy(col("anc"))
      .agg(count(lit(1)).as("subtree_count"),
        sum(col("own")).as("subtree_total"))
    val parentTotals = agg.select(col("anc").as("parent"),
      col("subtree_total").as("__ptotal"))
    nodes.join(agg.withColumnRenamed("anc", "node"), "node")
      .join(parentTotals, Seq("parent"), "left")
      .select(col("node"), col("parent"), col("own"),
        col("subtree_count"), col("subtree_total"),
        expr("""CASE WHEN __ptotal IS NOT NULL AND __ptotal <> 0 THEN
          (subtree_total * 1000) div __ptotal END""")
          .as("share_of_parent_permille"))
  }
}
