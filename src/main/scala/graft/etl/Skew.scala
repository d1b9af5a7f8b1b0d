package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles sort-merge
  * splits at runtime; these are for the cases it does not reach —
  * a hot key whose rows must still co-locate for a downstream
  * aggregation, or a shuffled join where one key dominates a reducer.
  *
  * The division of labor is spec-pinned, not folklore: SkewSpec
  * builds a skewed join where AQE's OptimizeSkewedJoin actually
  * FIRES (asserted from the finalized adaptive plan, with a
  * skewJoin-disabled control) — for a plain skewed equi-join AQE is
  * the first line of defense and [[saltedJoin]] is not needed. What
  * AQE cannot do, and these helpers exist for: AGGREGATION skew (a
  * groupBy hot key still funnels every row of the key to one
  * reducer — AQE splits join partitions, never an aggregation key:
  * [[saltedStats]]' two-phase split is the fix), and joins whose
  * output must stay co-partitioned for a downstream aggregation
  * (AQE's split replicates the matching partition and destroys the
  * co-partitioning a later stage would reuse — [[saltedJoin]] keeps
  * the partitioning under explicit control).
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

  /** EXACT heavy hitters in two bounded-memory passes: every non-null
    * value of `valueCol` occurring in MORE than `phi`·n rows, with its
    * exact count and share. This is the hot-key diagnosis that feeds
    * [[saltedJoin]]/[[saltedStats]] (run it on a join key; salt the
    * keys it returns), and the vocabulary-head / power-user report as
    * an operator.
    *
    * Pass 1 summarizes each partition with k = ⌈1/phi⌉ Misra–Gries
    * counters. The union of partition summaries is a COMPLETE
    * candidate set: if freq(x) > n/k then by pigeonhole
    * freq_p(x) > n_p/k in at least one partition p, and Misra–Gries
    * guarantees any such value survives that partition's summary. With
    * k = ⌈1/phi⌉, n/k ≤ phi·n, so no true heavy hitter is ever
    * missed. Pass 2 broadcast-semi-joins the tiny candidate frame
    * (≤ partitions·k values) back onto the data and counts EXACTLY —
    * the sketch only bounds pass-1 state (k counters per task, vs a
    * full hash aggregate whose map is unbounded under adversarial
    * cardinality); it can neither drop a true heavy hitter nor distort
    * a count, so the output is deterministic under ANY partitioning
    * and oracle-checkable (q104).
    *
    * The > threshold and the share are the only doubles — both exact
    * BIGINTs divided/compared in identical trees on both engines.
    *
    * The `value` column keeps the key's NATIVE type (the Misra–Gries
    * pass runs on a stringified shadow — the one typed-encoder-free
    * shape — but the exact recount groups the original column), so
    * the report joins directly onto the join key it diagnoses — the
    * downstream [[saltedJoin]] needs no cast on either side (SkewSpec
    * salts a bigint-keyed join straight off the report). */
  def heavyHitters(df: DataFrame, valueCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, "phi must be in (0,1)")
    val k = math.ceil(1.0 / phi).toInt
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("value"))
    val cands = vals.select(col("value").cast("string").as("__s"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .mapPartitions(it => misraGries(it, k))(org.apache.spark.sql.Encoders.STRING)
      .toDF("__s").distinct()
    val n = vals.agg(count(lit(1)).as("__n"))
    vals.join(broadcast(cands), col("value").cast("string") === col("__s"))
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt").cast("double") > lit(phi) * col("__n").cast("double"))
      .select(col("value"), col("cnt"),
        (col("cnt").cast("double") / col("__n").cast("double")).as("share"))
  }

  /** Exact equi-join cardinality profile WITHOUT executing the join —
    * the "will this join explode" diagnosis that belongs next to
    * [[heavyHitters]] (which finds hot keys on one side; this prices
    * the product of both): |A ⋈ B| on key k contributes
    * f_A(k)·f_B(k), so the total and the per-key contributions come
    * from joining the two COUNT TABLES (bounded by key domains, never
    * the data) — the planner's frequency-vector estimate made exact.
    * Run it before a risky join: a single key carrying 40% of the
    * output is the signal to route that key through [[saltedJoin]]
    * or reconsider the join entirely.
    *
    * Emits the `topK` keys by pair contribution (ties broken by key
    * string — deterministic) with both frequencies, the exact pair
    * count, and each key's share of the total output in permille.
    * NULL keys are excluded (SQL equi-joins never match them).
    * Shape: one map-side-combined aggregate per side, a hash join of
    * the two count tables, a 1-row total broadcast back. */
  def joinCardinality(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String,
                      topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val la = left.filter(col(leftKey).isNotNull)
      .select(col(leftKey).cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("f_left"))
    val rb = right.filter(col(rightKey).isNotNull)
      .select(col(rightKey).cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("f_right"))
    val perKey = la.join(rb, "key")
      .withColumn("pairs", col("f_left") * col("f_right"))
    val total = perKey.agg(
      coalesce(sum(col("pairs")), lit(0L)).as("total_pairs"))
    perKey.crossJoin(broadcast(total))
      .withColumn("share_permille",
        expr("(pairs * 1000) div total_pairs"))
      .orderBy(col("pairs").desc, col("key"))
      .limit(topK)
      .select("key", "f_left", "f_right", "pairs", "total_pairs",
        "share_permille")
  }

  /** Misra–Gries k-counter summary of one partition — the classic
    * streaming frequent-items pass, inherently sequential (the one
    * shape where mapPartitions beats an expression). Emits the
    * surviving values. The decrement-all step removes k+1 units of
    * total count per trigger, so it fires ≤ n/(k+1) times — O(n)
    * amortized, O(k) state. */
  private def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { v =>
      counters.get(v) match {
        case Some(c) => counters(v) = c + 1
        case None if counters.size < k => counters(v) = 1L
        case None =>
          // snapshot the keys: structural mutation mid-iteration over
          // a mutable map is undefined
          counters.keys.toArray.foreach { key =>
            val c = counters(key)
            if (c == 1L) counters.remove(key) else counters(key) = c - 1
          }
      }
    }
    counters.keysIterator
  }
}
