package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality over an edge list — the crawl-prioritization
  * signal behind CommonCrawl's harmonic/PageRank domain ranking (and
  * the quality prior several LLM corpus pipelines reuse: a page on a
  * well-linked domain is worth crawling and keeping before an orphan).
  *
  * Reference scope: the reference pipeline has no graph operator; this
  * extends the SURVEY §2.13 training-data surface (link harvest from
  * E-html feeds an edge list; this ranks it).
  *
  * Design — exact fixed-point PageRank (Page et al. 1999), NOT floats:
  * a float PageRank sums per-target contributions in partition order,
  * so the same graph can hash to different doubles run-to-run; ranks
  * here are BIGINT micro-units (`unit` = 1.0), every step is integer
  * multiply / floor-div / exact BIGINT sum, so the result is
  * bit-identical under ANY partitioning and any engine. The rounding
  * policy (floor at the contribution split and at the damping
  * multiply) is part of the operator's spec — the DuckDB oracle
  * applies the identical policy and must hash-match.
  *
  * Dangling nodes (in-links but no out-links) leak their mass rather
  * than redistributing it: redistribution needs a global
  * sum-of-dangling term each iteration, which is one more all-reduce
  * per step for a constant that vanishes under normalization; the
  * leaked variant keeps every step a local join+sum and is the
  * documented spec here.
  *
  * Scale shape: each iteration is (ranks ⋈ outdeg on node) ⋈ edges on
  * src → groupBy dst SUM — two hash joins and one partial-agg shuffle,
  * all keyed on the node id, linear in |edges|. Nothing is collected;
  * the iteration count is a small constant. Plans compose lazily and
  * depth grows linearly with `iterations`; for dozens of iterations
  * pass `materialize` (e.g. `_.localCheckpoint()`) to cut lineage —
  * at the default 3–10 the pure plan is better because Catalyst sees
  * the whole pipeline.
  */
object LinkGraph {

  /** One rank unit = 1.0 of probability mass, in micro-units. 1e12
    * leaves ~6 decimal digits of headroom above a billion-node graph
    * before BIGINT sums could overflow (total mass is bounded by
    * n·unit ≤ 9.2e18 for n ≤ 9.2e6 at this unit; pick a smaller unit
    * for larger node universes — the parameter exists for that). */
  val DefaultUnit: Long = 1000000000000L

  /** Exact fixed-point PageRank. `edges` is any DataFrame with string
    * (or other equatable) `src`/`dst` columns; multi-edges are
    * deduplicated and self-loops dropped (a self-loop is a rank
    * no-op that only distorts the out-degree split). Damping is the
    * rational `dampNum/dampDen` (default 85/100) so the damped step
    * stays in integers.
    *
    * Returns one row per node: (node, out_degree, rank_units) where
    * rank_units is the rank after `iterations` steps from a uniform
    * `unit` start. out_degree = 0 marks a dangling node.
    */
  def pagerank(edges: DataFrame, src: String, dst: String,
               iterations: Int = 3,
               unit: Long = DefaultUnit,
               dampNum: Long = 85, dampDen: Long = 100,
               materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")

    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

    // Node universe: anything that appears on either side. The rank
    // vector lives on this frame; every join below is keyed on `node`.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()

    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"))

    // Base (teleport) mass: floor(unit * (1 - d)) in one integer step.
    val base = (unit * (dampDen - dampNum)) / dampDen

    var ranks = nodes.withColumn("rank_units", lit(unit))
    for (_ <- 1 to iterations) {
      // Split each node's rank evenly over its out-edges (floor div —
      // the remainder, < out_degree micro-units, leaks; that loss is
      // part of the exact spec). Dangling nodes have no outdeg row and
      // contribute nothing.
      // Integer `div`, not double division + cast: a double round-trip
      // is only exact below 2^53, which a billion-node mass sum clears.
      val contribs = e
        .join(ranks.join(outdeg, "node").withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("rank_units div out_degree").as("contrib"))
      val inMass = contribs.groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("in_mass"))
      ranks = materialize(
        nodes.join(inMass, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen"))
              .as("rank_units")))
    }

    nodes.join(outdeg, Seq("node"), "left")
      .join(ranks, "node")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        col("rank_units"))
  }

  /** TrustRank — seed-personalized PageRank (Gyöngyi, Garcia-Molina &
    * Pedersen, *Combating Web Spam with TrustRank*, VLDB 2004): the
    * teleport mass lands ONLY on a trusted seed set, so trust flows
    * outward along links and pages unreachable from any seed decay to
    * zero — the published quality-propagation prior a web corpus uses
    * to damp spam neighborhoods before per-domain caps. Same exact
    * BIGINT micro-unit arithmetic and iteration plan as [[pagerank]]
    * (two hash joins + one agg per step, nothing collected,
    * bit-identical under any partitioning); the ONLY differences are
    * the start vector (unit on seeds, 0 elsewhere) and the teleport
    * base (seeds only). Seeds arrive as a DataFrame (a seed list at
    * corpus scale is itself a table, not a literal), joined once and
    * carried as a flag.
    *
    * Returns (node, out_degree, is_seed, rank_units). */
  def trustRank(edges: DataFrame, seeds: DataFrame,
                src: String = "src", dst: String = "dst",
                seedCol: String = "node",
                iterations: Int = 3,
                unit: Long = DefaultUnit,
                dampNum: Long = 85, dampDen: Long = 100,
                materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")

    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val flagged = nodes
      .join(seeds.select(col(seedCol).as("node"), lit(true).as("is_seed")).distinct(),
        Seq("node"), "left")
      .withColumn("is_seed", coalesce(col("is_seed"), lit(false)))

    val base = (unit * (dampDen - dampNum)) / dampDen
    var ranks = flagged.select(col("node"),
      when(col("is_seed"), lit(unit)).otherwise(lit(0L)).as("rank_units"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.join(outdeg, "node").withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("rank_units div out_degree").as("contrib"))
      val inMass = contribs.groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("in_mass"))
      ranks = materialize(
        flagged.join(inMass, Seq("node"), "left")
          .select(col("node"),
            (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
              expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen"))
              .as("rank_units")))
    }

    flagged.join(outdeg, Seq("node"), "left")
      .join(ranks, "node")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        col("is_seed"), col("rank_units"))
  }

  /** Normalized centrality over [[pagerank]]'s output: each node's
    * share of probability mass as an EXACT rational pair
    * (`share_num`/`share_den` = rank_units / n·unit) plus integer
    * permille projections against both the IDEAL mass n·unit and the
    * RETAINED mass Σ rank_units. The two denominators differ by
    * exactly the documented dangling/floor leak, so their gap doubles
    * as the leak audit; no floats anywhere, so the result is
    * bit-identical under any partitioning, like [[pagerank]] itself.
    *
    * Scale shape: no window, no collect — the totals are one 1-row
    * aggregate broadcast-joined to every row (the repo's standard
    * exact-total pattern), linear in nodes. Exactness bound:
    * multiply-before-divide needs rank_units·1000 < 2^63, i.e.
    * n·unit ≤ 9.2e15 — beyond ~9e3 nodes at the default unit, pass
    * the smaller `unit` the pagerank parameter exists for. */
  def normalizedRank(ranked: DataFrame, unit: Long = DefaultUnit): DataFrame = {
    val totals = ranked.agg(
      (count(lit(1)) * lit(unit)).as("share_den"),
      sum(col("rank_units")).as("retained_units"))
    ranked.crossJoin(broadcast(totals))
      .select(col("node"), col("out_degree"),
        col("rank_units").as("share_num"),
        col("share_den"),
        expr("(rank_units * 1000) div share_den").as("share_permille"),
        col("retained_units"),
        expr("(rank_units * 1000) div retained_units").as("retained_permille"))
  }
}
