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
}
