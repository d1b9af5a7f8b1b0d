package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar proximity join over integer coordinates — the spatial
  * member of the join family (equality: hash; temporal: E212 as-of /
  * E232 interval; set-similarity: E236 prefix filter; spatial: this).
  * "All pairs within radius r" is the geo-dedup / store-catchment /
  * sensor-correlation primitive, and the naive form is the N² cross
  * join that never finishes.
  *
  * Coordinates are integer micro-units (micro-degrees, millimetres —
  * the money-in-cents discipline: exact arithmetic, engine-identical
  * results; the planar approximation is the caller's stated contract,
  * sound at city/region scale where 1 µdeg is ~0.11 m).
  *
  * Grid-cell algorithm: tile the plane with radius-sized square
  * cells; a true pair within r ALWAYS lands in the same or an
  * adjacent cell, so build-side points key by their ONE home cell and
  * probe-side points expand to the 3×3 neighborhood (9 keys) — one
  * hash join on the cell key, then the exact integer refine
  * dx² + dy² ≤ r². Each candidate pair arises exactly ONCE (the build
  * point has one home cell), so no distinct pass is needed — the
  * replication factor is a flat 9 on the probe side only, versus N
  * for the cross join. Cell ids use FLOOR division (the nonneg-mod
  * identity — `div` truncates toward zero and would double-width the
  * origin cells; correct but skewed, so floor keeps cells uniform).
  *
  * Scale: shuffle is 9·|probe| + |build| rows keyed by cell; a dense
  * cell is a hot key — at radius-sized cells candidates are bounded
  * by true ~3r-neighbors, and residual skew is AQE's job (the E22
  * boundary). Overflow: |coordinates| < 2³⁰ keeps dx² + dy² inside
  * BIGINT with headroom.
  *
  * Reference scope: the reference pipeline has no spatial operator;
  * this extends the SURVEY §2.13 surface (geo-tagged corpus dedup and
  * event-site joins).
  */
object Spatial {

  /** Floor-divide a (possibly negative) integer column by d — exact
    * integral `div` on the pmod-adjusted numerator, never a double. */
  private def floorDiv(c: String, d: Long): Column =
    expr(s"($c - pmod($c, ${d}L)) div ${d}L")

  /** All (a, b) pairs with squared planar distance ≤ radius². Returns
    * (a_id, b_id, dist2). For a self-join pass the same frame twice
    * and filter `a_id < b_id` (or =!= for directed use). */
  def proximityJoin(probe: DataFrame, build: DataFrame, radius: Long,
                    probeId: String = "id", buildId: String = "id",
                    xCol: String = "x_e6", yCol: String = "y_e6"): DataFrame = {
    require(radius >= 1, "radius must be positive")
    val b = build.select(col(buildId).as("b_id"),
        col(xCol).cast("long").as("__bx"), col(yCol).cast("long").as("__by"))
      .withColumn("__cx", floorDiv("__bx", radius))
      .withColumn("__cy", floorDiv("__by", radius))
    val p = probe.select(col(probeId).as("a_id"),
        col(xCol).cast("long").as("__ax"), col(yCol).cast("long").as("__ay"))
      .withColumn("__hx", floorDiv("__ax", radius))
      .withColumn("__hy", floorDiv("__ay", radius))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("a_id"), col("__ax"), col("__ay"),
        (col("__hx") + col("__dx")).as("__cx"),
        (col("__hy") + col("__dy")).as("__cy"))
    p.join(b, Seq("__cx", "__cy"))
      .withColumn("dist2",
        (col("__ax") - col("__bx")) * (col("__ax") - col("__bx")) +
          (col("__ay") - col("__by")) * (col("__ay") - col("__by")))
      .filter(col("dist2") <= lit(radius) * lit(radius))
      .select(col("a_id"), col("b_id"), col("dist2"))
  }

  /** DBSCAN density clustering (Ester, Kriegel, Sander & Xu, KDD
    * 1996), exact, composed from the engine's own primitives: the
    * shape-agnostic clusterer k-means can't be (no k to pick, clusters
    * of any shape, NOISE is a first-class verdict — exactly what
    * geo-scatter, embedding-projection and fraud-burst data need).
    *
    * Exact Ester semantics, each piece distributed:
    *   - neighbor = squared integer distance ≤ eps² via
    *     [[proximityJoin]] (grid cells — never all pairs); the self
    *     pair arises exactly once, so the per-point pair count IS the
    *     |N_eps(p)| that includes p (the paper's counting).
    *   - core ⇔ |N_eps| ≥ minPts.
    *   - clusters = connected components of the core-core adjacency,
    *     via [[graft.dedup.Dedup.componentLabels]] (hash-to-min with
    *     parent notify — converges at ~log diameter); core self-loops
    *     ride along so an ISOLATED core keeps a singleton cluster.
    *     Labels are component-min ids — deterministic.
    *   - border = non-core with ≥1 core neighbor, assigned the MIN
    *     core-neighbor cluster label (the paper leaves multi-cluster
    *     borders arbitrary; min is this operator's stated tie rule —
    *     deterministic under any partitioning).
    *   - noise = the rest (cluster NULL).
    *
    * Scale: one grid join (9·N + N shuffle rows), one pair-keyed
    * count, the components fixpoint on CORE-core edges only (noise
    * and borders never enter the iteration), one join back. Dense
    * data is the stated hazard: a cell with ≫minPts points emits
    * quadratic in-cell pairs — eps should be chosen so cells hold
    * O(minPts) points, which is also when DBSCAN's OUTPUT is
    * meaningful. */
  def dbscan(points: DataFrame, eps: Long, minPts: Int,
             idCol: String = "id", xCol: String = "x_e6",
             yCol: String = "y_e6"): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val pts = points.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x_e6"), col(yCol).cast("long").as("y_e6"))
      .localCheckpoint()
    val pairs = proximityJoin(pts, pts, eps,
      probeId = "id", buildId = "id").localCheckpoint()
    val core = pairs.groupBy(col("a_id").as("id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("a_id")), Seq("a_id"))
      .join(core.select(col("id").as("b_id")), Seq("b_id"))
      .filter(col("a_id") <= col("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
    val labels = graft.dedup.Dedup.componentLabels(coreEdges)
    val borderLab = pairs
      .join(labels.select(col("node").as("b_id"), col("label")), Seq("b_id"))
      .join(core.select(col("id").as("a_id")), Seq("a_id"), "left_anti")
      .groupBy(col("a_id").as("id")).agg(min(col("label")).as("cluster"))
    val assigned = labels
      .select(col("node").as("id"), col("label").as("cluster"),
        lit("core").as("role"))
      .unionByName(borderLab.withColumn("role", lit("border")))
    pts.join(assigned, Seq("id"), "left")
      .select(col("id"), coalesce(col("role"), lit("noise")).as("role"),
        col("cluster"))
  }

  /** Per-cluster compactness audit over a clustering's assignments —
    * the quality read [[dbscan]]'s output owes its consumer (is
    * cluster 17 a tight blob or a sprawl?): the within-cluster
    * scatter Σ|p−μ|² per cluster, EXACT, via the centroid-free
    * identity n·Σ|p−μ|² = n·Σ|p|² − |Σp|² — sums of integer
    * coordinates only, no float centroid ever materializes (the
    * cleared-denominator discipline; the identity is König–Huygens).
    * Emitted: the exact scatter numerator (= n× the scatter) and the
    * mean squared radius in µ-unit² via truncating div (identical
    * both engines). BIGINT headroom: coords < 2²⁰ keep n·Σ|p|²
    * inside int64 past 10⁹ points/cluster; wider coords → the
    * numerator pieces still fit DECIMAL at the consumer (stated).
    *
    * Shape: one assignment join + one cluster-keyed aggregate,
    * map-side combinable; output bounded by clusters. */
  def clusterCompactness(points: DataFrame, assignments: DataFrame,
                         idCol: String = "id", xCol: String = "x_e6",
                         yCol: String = "y_e6"): DataFrame = {
    val pts = points.select(col(idCol).as("id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    pts.join(assignments.filter(col("cluster").isNotNull)
        .select(col("id"), col("cluster")), Seq("id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x") + col("__y") * col("__y")).as("__ss"))
      .select(col("cluster"), col("n_points"),
        (col("n_points") * col("__ss") - col("__sx") * col("__sx")
          - col("__sy") * col("__sy")).as("scatter_num"),
        expr("""(n_points * __ss - __sx * __sx - __sy * __sy)
                div (n_points * n_points)""").as("mean_radius2"))
  }
}
