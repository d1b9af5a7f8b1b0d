package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality/frequency sketches — the two classic
  * shard-local summaries a 100 TB engine keeps so that GLOBAL
  * questions ("how many distinct values", "how often does x occur")
  * never shuffle raw data: each executor/shard/day builds its own
  * kilobyte-sized sketch with one scan + one tiny aggregate, and
  * merges are pointwise (max of registers / sum of counters) over
  * frames the size of the sketch, not the corpus. Both sketches are
  * DataFrames, so persistence, union-across-days, and the merge
  * itself are ordinary Spark ops (the signature-index pattern,
  * [[graft.dedup.Dedup.writeSignatureIndex]]).
  *
  * Engine-neutral by construction (the q18 shared-constant device):
  * the value hash is the md5-derived 56-bit integer both engines
  * compute ([[graft.dedup.Dedup.tokenHash56]]'s idiom), register
  * positions are bit fields of it, and the leading-zero rank comes
  * from `length(bin(w))` — Spark and DuckDB share the `bin()`
  * builtin, so no float log2 anywhere near a bit boundary. The one
  * transcendental HLL needs (ln for small-range linear counting)
  * follows the Acklam/invNorm precedent: a DRIVER-SIDE generated
  * integer table baked into both twins; no ln runs inside a query.
  *
  * Reference anchor: cardinality/frequency probes next to the
  * reference's data_quality.py count checks — the approximate,
  * mergeable complement of the exact A7 nunique/value_counts rows.
  */
object Sketches {

  // ---- HyperLogLog (Flajolet et al. 2007, the dense variant) -------

  /** Register-index bits (m = 1024 registers, ±3.25% standard error);
    * the remaining 46 hash bits feed the rank. */
  val hllP: Int = 10
  val hllM: Int = 1 << hllP
  private val hllWBits: Int = 56 - hllP // 46

  /** α₁₀₂₄ · m² · 2⁴⁷ (the 2^(wBits+1) scale that keeps Σ2^(47−rho)
    * an exact int64 even at rho's ceiling of 47), rendered into BOTH
    * engine twins as one literal (the shared-constant device), so
    * raw_est is a single identical division in each engine. */
  val hllAlphaNum: Double =
    0.7213 / (1.0 + 1.079 / hllM) * hllM.toDouble * hllM.toDouble *
      math.pow(2.0, hllWBits + 1)

  /** 1000·m·ln(m/V) for V = 1..m (V = 0 unused), generated driver-side
    * once — the linear-counting small-range correction as an integer
    * table both twins embed (the invNorm precedent: no transcendental
    * inside a query). */
  val linearCountMilli: IndexedSeq[Long] = (0 to hllM).map(v =>
    if (v == 0) 0L else math.round(1000.0 * hllM *
      math.log(hllM.toDouble / v)))

  /** 56-bit md5 value hash (tokenHash56 over an arbitrary column,
    * stringified first so every type hashes identically cross-engine). */
  private def h56(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 14), 16, 10)
      .cast("long")

  /** Build the dense-HLL register frame of a column: one row per
    * OCCUPIED register, (register, max_rho). rho = leading-zero rank
    * of the low 46 hash bits + 1, via `length(bin(w))` (both engines'
    * bin() prints without leading zeros — no float log2). Shape: one
    * scan, one 1024-group hash aggregate with map-side combine; the
    * sketch is ≤ 1024 rows / ~16 KB regardless of input size. NULLs
    * are skipped (a NULL is not a value). */
  def hllSketch(df: DataFrame, valueCol: String): DataFrame = {
    val h = h56(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(shiftright(h, hllWBits).as("register"),
        (h.bitwiseAND(lit((1L << hllWBits) - 1))).as("__w"))
      .select(col("register"),
        when(col("__w") === 0, lit(hllWBits + 1).cast("long"))
          .otherwise(lit(hllWBits + 1) - length(bin(col("__w"))))
          .as("rho"))
      .groupBy(col("register")).agg(max(col("rho")).as("max_rho"))
  }

  /** Merge sketches: union + pointwise max — commutative, idempotent,
    * associative, so shard/day sketches combine in any order and a
    * re-merge of an already-merged sketch is a no-op. The merge
    * shuffles ≤ 1024·k rows. */
  def hllMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("register")).agg(max(col("max_rho")).as("max_rho"))
  }

  /** Estimate distinct count from a register frame: one row with the
    * occupancy stats, the raw harmonic-mean estimate (alpha·m²·2⁴⁶ /
    * S, S the EXACT integer Σ 2^(46−rho) + zeros·2⁴⁶ ≤ 2⁵⁶ — int64,
    * one double division at the end), and est_milli with the standard
    * small-range correction: linear counting m·ln(m/V) from the
    * driver-side table when raw ≤ 2.5m and zero registers remain. */
  def hllEstimate(sketch: DataFrame): DataFrame = {
    val lcArr = array(linearCountMilli.map(lit): _*)
    sketch
      .agg(count(lit(1)).as("n_used"),
        // SQL shiftleft (expression shift amount; the functions.
        // shiftleft overload only takes a literal)
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${hllWBits + 1} - max_rho AS INT))"))
          .as("__s_used"))
      .select(lit(hllM.toLong).as("m"), col("n_used"),
        (lit(hllM.toLong) - col("n_used")).as("n_zero"),
        (coalesce(col("__s_used"), lit(0L)) +
          (lit(hllM.toLong) - col("n_used")) * lit(1L << (hllWBits + 1)))
          .as("s_scaled"))
      .withColumn("raw_est", lit(hllAlphaNum) / col("s_scaled").cast("double"))
      .withColumn("est_milli",
        when(col("n_zero") > 0 &&
            col("raw_est") <= lit(2.5 * hllM),
          element_at(lcArr, (col("n_zero") + 1).cast("int")))
          .otherwise(round(col("raw_est") * 1000).cast("long")))
  }

  /** Distinct-overlap estimate of two sketched sets by
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where
    * the union sketch is [[hllMerge]]'s pointwise max — the only set
    * operation HLL supports natively, which is exactly why the
    * intersection must come from I–E (stated error caveat: the
    * estimate inherits ~1σ from EACH term, so small true overlaps of
    * large sets drown in noise — the standard HLL limitation; a small
    * result says "no large overlap", not "no overlap"). The
    * LLM-pipeline use: estimate train ∩ benchmark contamination
    * across shards from kilobyte sketches without ever joining raw
    * data, then escalate to the exact E-contamination scan only where
    * the sketch says the overlap is material. One row out; integer
    * milli units end to end (est_milli differences — can go NEGATIVE
    * from estimator noise; clamped at 0 with the raw value kept). */
  def hllOverlap(skA: DataFrame, skB: DataFrame): DataFrame = {
    def one(sk: DataFrame, name: String) =
      hllEstimate(sk).select(col("est_milli").as(name))
    one(skA, "est_a_milli")
      .crossJoin(one(skB, "est_b_milli")) // 1-row frames
      .crossJoin(one(hllMerge(skA, skB), "est_union_milli"))
      .withColumn("inter_raw_milli",
        col("est_a_milli") + col("est_b_milli") - col("est_union_milli"))
      .withColumn("est_intersection_milli",
        greatest(col("inter_raw_milli"), lit(0L)))
  }

  /** Per-GROUP register frames — the everyday shape ("distinct users
    * per day/source/shard"): one row per occupied (group, register),
    * same construction as [[hllSketch]], one hash aggregate total
    * (grouped sketches for a whole dimension cost ONE pass, where
    * exact per-group countDistinct shuffles every raw value). Merge =
    * union + max per (group, register) — [[hllMerge]] works verbatim
    * when the group column is carried, via groupCols here. */
  def hllSketchBy(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val h = h56(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        shiftright(h, hllWBits).as("register"),
        (h.bitwiseAND(lit((1L << hllWBits) - 1))).as("__w"))
      .select(col("group"), col("register"),
        when(col("__w") === 0, lit(hllWBits + 1).cast("long"))
          .otherwise(lit(hllWBits + 1) - length(bin(col("__w"))))
          .as("rho"))
      .groupBy(col("group"), col("register"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Per-group estimates from a [[hllSketchBy]] frame: one row per
    * group with the same exact-integer S / shared-literal raw_est /
    * table-driven linear-counting branch as [[hllEstimate]]. */
  def hllEstimateBy(sketch: DataFrame): DataFrame = {
    val lcArr = array(linearCountMilli.map(lit): _*)
    sketch
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${hllWBits + 1} - max_rho AS INT))"))
          .as("__s_used"))
      .select(col("group"), lit(hllM.toLong).as("m"), col("n_used"),
        (lit(hllM.toLong) - col("n_used")).as("n_zero"),
        (coalesce(col("__s_used"), lit(0L)) +
          (lit(hllM.toLong) - col("n_used")) * lit(1L << (hllWBits + 1)))
          .as("s_scaled"))
      .withColumn("raw_est", lit(hllAlphaNum) / col("s_scaled").cast("double"))
      .withColumn("est_milli",
        when(col("n_zero") > 0 &&
            col("raw_est") <= lit(2.5 * hllM),
          element_at(lcArr, (col("n_zero") + 1).cast("int")))
          .otherwise(round(col("raw_est") * 1000).cast("long")))
  }

  // ---- Count-Min sketch (Cormode & Muthukrishnan 2005) --------------

  /** Fixed pairwise-independent hash family over the 56-bit value
    * hash: row i maps x to ((aᵢ·h(x) + bᵢ) mod P) mod width. Own
    * coefficient table (NOT minhash's — sharing would correlate the
    * sketches' errors with the dedup family's band keys). */
  val cmsDepth: Int = 4
  val cmsWidth: Int = 1024
  val cmsP: Long = 1000000007L
  val cmsCoeffs: Seq[(Long, Long)] = Seq(
    (104729L, 48611L), (224737L, 86243L),
    (350377L, 15485867L), (479909L, 32452843L))

  private def cmsCols(h: Column): Seq[Column] = {
    // reduce h mod P BEFORE the multiply: h is 56-bit and a is ~2^19,
    // so the raw product would overflow int64; (h mod P) keeps every
    // intermediate under P·a < 2^60 (all operands nonnegative, so
    // pmod ≡ %s — the oracle writes plain %)
    val hp = pmod(h, lit(cmsP))
    cmsCoeffs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"),
        pmod(pmod(hp * lit(a) + lit(b), lit(cmsP)), lit(cmsWidth.toLong))
          .as("col"))
    }
  }

  /** Build the Count-Min counter frame of a column: one row per
    * OCCUPIED (row, col) cell with its count — ≤ depth·width rows
    * (4096) regardless of input. One scan + explode(depth) + one
    * map-side-combining aggregate; mergeable by SUM ([[cmsMerge]]),
    * so per-shard sketches add without touching raw data. NULLs are
    * skipped. */
  def cmsSketch(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(explode(array(cmsCols(h56(col(valueCol))): _*)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.col").as("col"))
      .groupBy(col("row"), col("col")).agg(count(lit(1)).as("cnt"))

  /** Merge Count-Min sketches: union + pointwise SUM (the linearity
    * that makes CMS the distributed-frequency workhorse; also how a
    * sketch of yesterday ∪ today is yesterday's plus today's). */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query a sketch for each DISTINCT probe value: estimate =
    * min over the depth rows of the probed cells (absent cell = 0).
    * Exact integers end to end; the classic guarantee — estimate ≥
    * true count always (never under), ≤ true + εN with probability
    * 1−δ (ε = e/width, δ = e^−depth) — is oracle-checkable per probe.
    * The probe side is broadcast-sized by contract (a query list, not
    * a corpus). */
  def cmsQuery(sketch: DataFrame, probes: DataFrame,
               valueCol: String): DataFrame = {
    val keys = probes.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("value")).distinct()
      .select(col("value"),
        explode(array(cmsCols(h56(col("value"))): _*)).as("rc"))
      .select(col("value"), col("rc.row").as("row"), col("rc.col").as("col"))
    keys.join(sketch, Seq("row", "col"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ---- HDR quantile histogram (Tene's HdrHistogram; the base-2 ----
  //      exponential-histogram family, cf. OpenTelemetry's scale
  //      parameter) — the QUANTILE member completing the mergeable
  //      shelf: HLL answers "how many distinct", CMS "how often does
  //      x occur", THIS "what is the p99"

  /** Sub-bucket precision bits: each power-of-two octave splits into
    * 2^5 = 32 linear sub-buckets, so a bucket's width is ≤ its lower
    * bound >> 5 — relative quantile error ≤ 2⁻⁵ ≈ 3.1%, and values
    * below 2^(5+1) = 64 are EXACT (their buckets are singletons, the
    * HdrHistogram low-range property). */
  val hdrSubBits: Int = 5

  /** Build the HDR bucket frame of a NONNEGATIVE integer column: one
    * row per occupied (exp, man) bucket with its count, where
    * exp = max(0, bitlen(v) − 1 − subBits) and man = v >> exp — pure
    * integer arithmetic via `length(bin(v))` (the HLL device: both
    * engines print bin() without leading zeros, no float log2). The
    * bucket covers [man<<exp, ((man+1)<<exp) − 1]; distinct buckets
    * never overlap, so ordering by lower bound is total. Bucket count
    * is bounded by (64 − subBits)·2^subBits + 2^(subBits+1) ≈ 1.9k
    * rows for the full int64 range — kilobytes regardless of input,
    * like the register/counter frames above. One scan + one hash
    * aggregate with map-side combine; counts ROWS (a histogram, not a
    * distinct sketch), so shard sketches merge by SUM. NULLs are
    * skipped; a negative value RAISES (the mannWhitneyPairs
    * refuse-never-wrap contract — mantissa arithmetic is meaningless
    * on negatives; callers sketch micro-unit magnitudes). */
  def hdrSketch(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(when(col(valueCol) < 0,
          raise_error(concat(lit(s"hdrSketch: negative value in $valueCol: "),
            col(valueCol).cast("string"))).cast("long"))
        .otherwise(col(valueCol).cast("long")).as("__v"))
      .select(col("__v"),
        greatest(lit(0),
          when(col("__v") === 0, lit(0)).otherwise(length(bin(col("__v"))))
            - lit(1 + hdrSubBits)).cast("int").as("exp"))
      .select(col("exp"), expr("shiftright(__v, exp)").as("man"))
      .groupBy(col("exp"), col("man")).agg(count(lit(1)).as("cnt"))

  /** Per-GROUP bucket frames — per-source/lang/day length or latency
    * distributions in ONE pass (the hllSketchBy shape): one row per
    * occupied (group, exp, man). */
  def hdrSketchBy(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        when(col(valueCol) < 0,
          raise_error(concat(lit(s"hdrSketchBy: negative value in $valueCol: "),
            col(valueCol).cast("string"))).cast("long"))
        .otherwise(col(valueCol).cast("long")).as("__v"))
      .select(col("group"), col("__v"),
        greatest(lit(0),
          when(col("__v") === 0, lit(0)).otherwise(length(bin(col("__v"))))
            - lit(1 + hdrSubBits)).cast("int").as("exp"))
      .select(col("group"), col("exp"), expr("shiftright(__v, exp)").as("man"))
      .groupBy(col("group"), col("exp"), col("man"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge HDR sketches: union + pointwise SUM over every non-count
    * column — works verbatim for both the global (exp, man) and the
    * grouped (group, exp, man) shapes, and yesterday ∪ today is
    * yesterday's plus today's (the cmsMerge linearity). */
  def hdrMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    val keys = sketches.head.columns.filterNot(_ == "cnt").toSeq
    sketches.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile query over a bucket frame, permille ranks (integers —
    * exact rank arithmetic, the house convention): for each q‰, rank
    * r = max(1, ⌈q·n/1000⌉) and the answer is the bucket where the
    * cumulative count (in lower-bound order) first reaches r — the
    * bucket that CONTAINS the rank-r order statistic, an identity the
    * oracle checks (exact value ∈ [lo, hi] always; q=0 hits the min
    * bucket, q=1000 the max). est = lo + (hi−lo)/2, the midpoint,
    * within relative 2⁻⁵ of the true quantile for exp > 0 and exact
    * below 64. Shape: everything downstream of the sketch is
    * sketch-sized (≤ ~1.9k rows by construction — the one-partition
    * running-sum window is bounded, stated); empty sketch → empty
    * frame, never a division error. */
  def hdrQuantiles(sketch: DataFrame,
                   permilles: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 0 && p <= 1000),
      "permilles must be in [0,1000]")
    val cum = sketch
      .select(col("exp"), col("man"), col("cnt"),
        expr("shiftleft(man, exp)").as("lo"),
        (expr("shiftleft(man + CAST(1 AS BIGINT), exp)") - lit(1L)).as("hi"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lo"))))
    val withQ = cum
      .crossJoin(broadcast(sketch.agg(sum(col("cnt")).as("n")))) // 1 row
      .select(col("lo"), col("hi"), col("cum"), col("n"),
        explode(array(permilles.map(lit): _*)).as("q_permille"))
      .withColumn("rank",
        greatest(lit(1L), expr("(q_permille * n + 999) div 1000")))
    val pick = withQ.filter(col("cum") >= col("rank"))
      .groupBy(col("q_permille"), col("n"), col("rank"))
      .agg(min(col("lo")).as("lo"))
    pick.join(cum.select(col("lo"), col("hi")), Seq("lo"))
      .select(col("q_permille"), col("n"), col("rank"), col("lo"), col("hi"),
        expr("lo + (hi - lo) div 2").as("est"))
  }

  /** Per-group quantiles from a [[hdrSketchBy]] frame: the same rank
    * arithmetic and bucket pick per group (windows partitioned by
    * group, totals joined per group — nothing crosses groups). */
  def hdrQuantilesBy(sketch: DataFrame,
                     permilles: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 0 && p <= 1000),
      "permilles must be in [0,1000]")
    val cum = sketch
      .select(col("group"), col("exp"), col("man"), col("cnt"),
        expr("shiftleft(man, exp)").as("lo"),
        (expr("shiftleft(man + CAST(1 AS BIGINT), exp)") - lit(1L)).as("hi"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("group")).orderBy(col("lo"))))
    val totals = sketch.groupBy(col("group")).agg(sum(col("cnt")).as("n"))
    val withQ = cum.join(totals, Seq("group"))
      .select(col("group"), col("lo"), col("hi"), col("cum"), col("n"),
        explode(array(permilles.map(lit): _*)).as("q_permille"))
      .withColumn("rank",
        greatest(lit(1L), expr("(q_permille * n + 999) div 1000")))
    val pick = withQ.filter(col("cum") >= col("rank"))
      .groupBy(col("group"), col("q_permille"), col("n"), col("rank"))
      .agg(min(col("lo")).as("lo"))
    pick.join(cum.select(col("group"), col("lo"), col("hi")),
        Seq("group", "lo"))
      .select(col("group"), col("q_permille"), col("n"), col("rank"),
        col("lo"), col("hi"),
        expr("lo + (hi - lo) div 2").as("est"))
  }
}
