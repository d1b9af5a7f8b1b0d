package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `df.sample` is seed-stable only for a fixed partitioning — a
  * repartition or a different file split silently changes the sample.
  * These operators hash VALUES, so the sample is a pure function of
  * the data: reproducible across engines (md5-derived arithmetic, the
  * [[graft.text.TextAnalysis.tokenHash]] trick), across partitionings,
  * and across days of an incremental pipeline (a row's membership
  * never flips as unrelated rows arrive — exactly what a frozen eval
  * split needs).
  */
object Sampling {

  /** 56-bit md5-derived hash of a key column — uniform, engine-neutral. */
  def keyHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 14), 16, 10)
      .cast("long")

  /** Keep ~1/`rate` of rows: hash(key) % rate == 0. One projection +
    * filter, no shuffle, pushes nothing but survives everything. */
  def hashSample(df: DataFrame, keyCol: String, rate: Int): DataFrame = {
    require(rate > 0, "rate must be positive")
    df.filter(keyHash(col(keyCol)) % rate === 0)
  }

  /** Rendezvous / highest-random-weight shard assignment (Thaler &
    * Ravishankar, ToN 1998; the router behind consistent bucket
    * placement without a ring): shard(key) = argmax over shards of
    * hash(key # shard). The property `hash mod n` lacks and 100 TB
    * re-layouts care about: adding shard n+1 remaps ONLY the keys the
    * new shard now wins — an expected 1/(n+1) of them — and every
    * moved key moves TO the new shard; `mod` remaps ~n/(n+1) of
    * everything (the spec pins both facts). Same [[keyHash]] md5
    * convention as the samplers, so assignment is engine-portable.
    *
    * Shape: a PURE scalar projection — the n candidate (weight,
    * shard) structs are built inline and the argmax is
    * `sort_array desc [1]` (struct ordering: weight first; a 56-bit
    * hash tie is ~impossible, and the struct order still breaks it
    * deterministically toward the larger shard — stated). No explode,
    * no window, no shuffle; n md5s per row. */
  def rendezvousShard(df: DataFrame, keyCol: String, nShards: Int,
                      outCol: String = "shard"): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val candidates = array((0 until nShards).map { s =>
      struct(
        keyHash(concat(col(keyCol).cast("string"), lit("#"), lit(s.toString)))
          .as("w"),
        lit(s).as("shard"))
    }: _*)
    df.withColumn(outCol,
      element_at(sort_array(candidates, asc = false), 1)("shard"))
  }

  /** Stratified fixed-size sample: `k` rows per stratum, chosen by
    * hash order (deterministic, uniform within the stratum; ties on
    * the full key). One shuffle on the stratum column. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyHash(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** WEIGHTED sample without replacement via priority sampling
    * (Duffield, Lund & Thorup, JACM 2007) — the weighted counterpart
    * to [[stratifiedSample]]'s uniform hash order: per stratum the k
    * rows with the SMALLEST priority q = u div w, where u is the
    * 56-bit [[keyHash]] uniform and w the row's positive integer
    * weight — heavier rows draw smaller priorities ∝ 1/w, so
    * inclusion probability scales with weight (the
    * size-biased/importance sample a token-weighted corpus cut or a
    * spend-weighted user panel needs). The integer floor div of the
    * published continuous u/w priority is the stated deterministic
    * variant (the engine-neutral discipline everywhere in this file);
    * (priority, key) tie-break is a total order, so both engines cut
    * identically and the sample is a pure function of the data.
    *
    * Zero/negative/null weights are REFUSED loudly — a zero weight
    * divides to 0 and would always win the sample, the opposite of
    * "weight zero means never sample", so silence would invert the
    * caller's intent. Shape: one filter-free scan + one partitioned
    * top-k window (InferWindowGroupLimit pre-shuffle cap, the
    * quotaPerGroup scale argument). */
  def prioritySample(df: DataFrame, stratumCol: String, keyCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val wgt = col(weightCol).cast("long")
    val bad = df.filter(wgt.isNull || wgt <= 0L)
    if (!bad.isEmpty) throw new IllegalArgumentException(
      s"prioritySample: null/non-positive $weightCol — a zero weight " +
        "would ALWAYS be sampled (priority 0), inverting the intent; " +
        "filter or fix weights first")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(expr(s"CAST(${priorityExpr(keyCol, weightCol)} AS BIGINT)"),
        col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** The q = u div w priority as a SQL fragment (shared with callers
    * that want the priority exposed for audit). */
  private def priorityExpr(keyCol: String, weightCol: String): String =
    s"CAST(conv(substring(md5(CAST(CAST($keyCol AS STRING) AS BINARY)), " +
      s"1, 14), 16, 10) AS BIGINT) div CAST($weightCol AS BIGINT)"

  /** Group-quota cap — the domain-capping curation primitive: at most
    * `k` rows per group, keeping the TOP rows by `order` (e.g. the k
    * highest-quality documents per (lang, domain); append a
    * deterministic tiebreak column or the cap itself is
    * nondeterministic). Declarative row_number is the SCALE form here,
    * not just the simple one: Catalyst's InferWindowGroupLimit rewrites
    * the `rn <= k` filter into a per-partition top-k
    * (WindowGroupLimit) BEFORE the shuffle, so each task ships at most
    * k rows per group it saw — a monster group costs its partitions ×
    * k rows on the wire, never its full population. */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String],
                    order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty && order.nonEmpty, "need group and order columns")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic training-shard assignment + epoch-stable global
    * shuffle: `shard = hash(key) % nShards`, and the position within
    * the shard orders by an INDEPENDENTLY salted hash (an unsalted
    * reuse would sort every shard by the same value that chose it,
    * leaving the order correlated with the assignment). Writing shard
    * files is then `repartition($"shard")` + sort-within — exactly the
    * shuffle this window form compiles to: one exchange on shard, a
    * per-partition sort, no global order. A training job reading shard
    * s gets the same documents in the same order on every run and
    * every cluster size — the reproducible-data-order contract. */
  def trainShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val orderHash = keyHash(concat(lit("order:"), col(keyCol).cast("string")))
    val shard = (keyHash(col(keyCol)) % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(orderHash, col(keyCol))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Rebalance a corpus toward TARGET stratum proportions by
    * downsampling only (no duplication): the most over-demanded
    * stratum — max target-weight/count ratio — is kept whole, and
    * every other stratum keeps `floor(10000 · w_s · n_M / (n_s · w_M))`
    * permyriad of its rows via the deterministic hash filter. The
    * per-stratum counts are one tiny aggregate (strata are a config-
    * sized set, like the rate tables above) collected to the driver to
    * build the literal rate table; the data path stays a single
    * projection + filter.
    *
    * The permyriad arithmetic is pure integer math (BigInt, engine-
    * reproducible); only the argmax choice uses one double division
    * per stratum, identical IEEE on both engines. */
  def mixToTarget(df: DataFrame, stratumCol: String, keyCol: String,
                  targetWeights: Map[String, Int]): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ > 0),
      "target weights must be positive")
    val counts = df.filter(col(stratumCol).isInCollection(targetWeights.keys.toSeq))
      .groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targetWeights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no target stratum present in the data")
    // anchor M = stratum with max w/n (kept whole); deterministic tie-break
    val (mS, mW) = present.keys.toSeq.sorted
      .map(s => (s, targetWeights(s)))
      .sortBy { case (s, w) => (-(w.toDouble / counts(s)), s) }.head
    val permyriad = present.map { case (s, w) =>
      s -> (BigInt(10000) * w * counts(mS) / (BigInt(counts(s)) * mW)).toInt
    }
    stratifiedRateSample(df, stratumCol, keyCol, permyriad, defaultPermyriad = 0)
  }

  /** Temperature-smoothed mixture with α = 1/2, EXACT — the published
    * smoothing for multilingual/multi-domain sampling (p_s ∝ n_s^α,
    * the exponentiated-count rule of multilingual BERT and XLM-R,
    * arXiv:1911.02116 §5.1; α between 0.3 and 0.7 in practice):
    * dominant strata are downsampled toward the smoothed share, rare
    * strata are kept whole, and NOTHING is duplicated. α = 1/2 is the
    * one temperature where the smoothed weight is exactly computable
    * in integers — weight_s = isqrt(n_s) (`BigInteger.sqrt`, floor
    * square root) — so the keep rates are pure BigInt arithmetic and a
    * SQL oracle re-derives them from a corrected floor(sqrt(double)):
    * reproducibility the float `pow(n, 0.3)` form cannot offer.
    *
    * Rates follow the [[mixToTarget]] anchor pattern: the stratum with
    * max weight/count (≈ the rarest; one IEEE double division per
    * stratum, identical across engines, ties to the smaller name) is
    * kept whole, every other stratum keeps
    * `floor(10000 · w_s · n_A / (n_s · w_A))` permyriad of its rows
    * via the deterministic hash filter — so membership is a pure
    * function of the data, nested under rate increases, and stable as
    * unrelated rows arrive. Scale shape: one tiny per-stratum count
    * aggregate to the driver (strata are a config-sized set), then a
    * single projection + filter on the data path — no shuffle. Rows
    * with a NULL stratum are dropped (rate 0), like [[mixToTarget]]'s
    * target filter. */
  def temperatureMixSqrt(df: DataFrame, stratumCol: String,
                         keyCol: String): DataFrame =
    stratifiedRateSample(df, stratumCol, keyCol,
      temperatureRatesSqrt(stratumCounts(df, stratumCol)),
      defaultPermyriad = 0)

  /** Per-stratum audit of [[temperatureMixSqrt]] — the mixture report
    * a curation run logs: stratum, n_before, the isqrt weight, the
    * exact keep rate, and n_after actually surviving the hash filter.
    * Shape: two stratum-keyed partial aggregates + a literal-table
    * join; nothing beyond the strata set is collected. */
  def temperatureMixAudit(df: DataFrame, stratumCol: String,
                          keyCol: String): DataFrame = {
    val counts = stratumCounts(df, stratumCol)
    val rates = temperatureRatesSqrt(counts)
    val spark = df.sparkSession
    import spark.implicits._
    val rateTable = counts.keys.toSeq.sorted.map { s =>
      (s, counts(s), isqrt(counts(s)), rates(s).toLong)
    }.toDF(stratumCol, "n_before", "weight", "rate_permyriad")
    val after = temperatureMixSqrt(df, stratumCol, keyCol)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n_after"))
    rateTable.join(after, Seq(stratumCol), "left")
      .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
  }

  /** Token-budget fill — the budgeted-curation primitive ("fill a
    * 1B-token budget with the best documents"): per group, documents
    * are taken in descending quality order until the token budget is
    * exhausted; the document that CROSSES the boundary is kept (its
    * cumulative count before adding it was still under budget —
    * "first crossing kept", stated and oracled, so budgets are
    * slightly overshot rather than silently undershot). Emits the
    * full audit (cumulative tokens, kept flag) rather than just the
    * survivors — the drop set is reviewable.
    *
    * One window per group ordered (quality desc, tie): the running
    * sum is a framed prefix aggregate, no collect, no second pass;
    * ties need the unique tiebreak or the boundary document is
    * partition-order-dependent (the quotaPerGroup contract). */
  def tokenBudgetFill(df: DataFrame, groupCol: String, tokensCol: String,
                      budget: Long, quality: Seq[Column],
                      tieCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy((quality :+ col(tieCol)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("kept", col("cum_tokens") - col(tokensCol) < budget)
  }

  /** Weighted token-budget source mixing — the pretraining data-mix
    * scheduler composing [[tokenBudgetFill]]'s per-group fill with
    * WEIGHT-DRIVEN budget allocation (the "20% code, 30% web, 10%
    * books" recipe every LLM data card states): given a weights table
    * (source, weight) and a total token budget, each source gets
    * budget_s = total·w_s div Σw (exact floor split from the ACTUAL
    * weight sum — callers need not pre-normalize), then fills it in
    * the caller's `order` (pass a [[keyHash]] column for an unbiased
    * deterministic "shuffle", or quality columns for curated fill).
    * Same boundary convention as tokenBudgetFill, stated: the
    * document that CROSSES the budget is kept (budgets slightly
    * overshoot, never silently undershoot). Emits every row with its
    * (weight, budget_tokens, cum_tokens, kept) — the drop set is
    * reviewable, and sources too small to fill their budget surface
    * as under-filled, not silently absent.
    *
    * Shape: one broadcast of the config-sized weights×Σw table, one
    * per-source window (partitioned — never the global-sort trap).
    * Sources absent from the weights table are dropped (weight 0,
    * stated). */
  def tokenBudgetMix(df: DataFrame, sourceCol: String, tokensCol: String,
                     weights: DataFrame, totalBudget: Long,
                     order: Seq[Column], tieCol: String,
                     weightCol: String = "weight"): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    val wsum = weights.agg(sum(col(weightCol)).as("__wsum"))
    val b = weights.select(col(sourceCol),
        col(weightCol).cast("long").as("weight"))
      .crossJoin(broadcast(wsum))
      .withColumn("budget_tokens",
        expr(s"(${totalBudget}L * weight) div __wsum"))
      .drop("__wsum")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy((order :+ col(tieCol)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(b), sourceCol)
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("kept",
        col("cum_tokens") - col(tokensCol) < col("budget_tokens"))
  }

  /** Floor integer square root, exact for any non-negative Long. */
  def isqrt(n: Long): Long = {
    require(n >= 0, "isqrt of a negative count")
    BigInt(n).bigInteger.sqrt().longValueExact()
  }

  private def stratumCounts(df: DataFrame, stratumCol: String): Map[String, Long] =
    df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The exact α = 1/2 rate table: anchor A = argmax isqrt(n)/n kept
    * whole, others at floor(10000 · isqrt(n_s) · n_A / (n_s · isqrt(n_A))). */
  def temperatureRatesSqrt(counts: Map[String, Long]): Map[String, Int] = {
    require(counts.nonEmpty, "no stratum present in the data")
    val weights = counts.map { case (s, n) => s -> isqrt(n) }
    val (aS, aW) = counts.keys.toSeq.sorted
      .map(s => (s, weights(s)))
      .sortBy { case (s, w) => (-(w.toDouble / counts(s)), s) }.head
    counts.map { case (s, n) =>
      s -> (BigInt(10000) * weights(s) * counts(aS) / (BigInt(n) * aW)).toInt
    }
  }

  /** Purged walk-forward K-fold assignment for time-ordered rows —
    * the "purged cross-validation" split of financial ML (López de
    * Prado, *Advances in Financial Machine Learning*, 2018, ch. 7):
    * the corpus date range is cut into K contiguous day blocks; for
    * fold f the block is TEST, and otherwise-train rows within
    * `embargoDays` of the block's edges are PURGED — the rows whose
    * rolling features / forward labels straddle the boundary and
    * would leak test information into training under a plain K-fold
    * (the time-axis twin of [[graft.dedup.Dedup.leakageSafeSplit]]'s
    * content-axis guarantee).
    *
    * Exactness: a row's block is pure integer arithmetic —
    * `(dayIndex·k) div span` with dayIndex = datediff(date, corpus
    * min) — and block boundaries use the matching closed forms
    * `start_f = ⌈f·span/k⌉`, `end_f = start_(f+1) − 1`, so fold
    * membership is a pure function of the data (partitioning-proof)
    * and a SQL oracle re-derives it from the same formulas.
    *
    * Scale shape: one 1-row min/max aggregate broadcast back (the
    * standard exact-total pattern), then a single projection +
    * `explode` over the k folds. The k× expansion is the operator's
    * contract (every row has a role in every fold); audit callers
    * aggregate immediately, so only (fold, role) keys shuffle. */
  def purgedTimeFolds(df: DataFrame, dateCol: String, k: Int,
                      embargoDays: Int): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    require(embargoDays >= 0, "embargo must be >= 0")
    val bounds = df.agg(min(col(dateCol)).as("__dmin"), max(col(dateCol)).as("__dmax"))
    df.crossJoin(org.apache.spark.sql.functions.broadcast(bounds))
      .withColumn("__span", (datediff(col("__dmax"), col("__dmin")) + 1).cast("long"))
      .withColumn("__di", datediff(col(dateCol), col("__dmin")).cast("long"))
      .withColumn("fold", explode(sequence(lit(0L), lit((k - 1).toLong))))
      .withColumn("__blk", expr(s"(__di * $k) div __span"))
      .withColumn("__sf", expr(s"(fold * __span + ${k - 1}) div $k"))
      .withColumn("__ef", expr(s"((fold + 1) * __span + ${k - 1}) div $k - 1"))
      .withColumn("role",
        when(col("__blk") === col("fold"), lit("test"))
          .when(col("__di") >= col("__sf") - embargoDays &&
                col("__di") <= col("__ef") + embargoDays, lit("purged"))
          .otherwise(lit("train")))
      .drop("__dmin", "__dmax", "__span", "__di", "__blk", "__sf", "__ef")
  }

  /** General per-stratum REWEIGHTING in permyriad — the epochs mixer
    * of a training-data pipeline, covering both directions where
    * [[stratifiedRateSample]] only downsamples: factor 2_500 keeps a
    * quarter of the stratum, 10_000 passes it through, 25_000 repeats
    * every row twice and half the rows (hash-chosen) a third time —
    * i.e. fractional epochs, the way rare high-quality sources are
    * oversampled into a mixture (every LLM data recipe's
    * "epochs-per-source" table). Deterministic: copies = factor div
    * 10000 plus one more iff an INDEPENDENTLY salted key hash clears
    * the fractional part (the salt decorrelates the extra-copy choice
    * from the downsampling filter's hash), so the output is a pure
    * function of the data, and raising a factor only ADDS copies
    * (nested mixes, the reproducible-reweighting property). Each copy
    * carries its index (`copy` 0..n-1) so downstream shards can salt
    * on it. One projection + explode, no shuffle; the blow-up is the
    * caller's contract. */
  def upsampleToFactor(df: DataFrame, stratumCol: String, keyCol: String,
                       permyriadFactor: Map[String, Int],
                       defaultPermyriad: Int = 10000): DataFrame = {
    require((defaultPermyriad +: permyriadFactor.values.toSeq).forall(_ >= 0),
      "factors must be >= 0")
    val factor = permyriadFactor.toSeq.sortBy(_._1).foldRight(
      lit(defaultPermyriad): Column) { case ((s, r), acc) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    val extra = when(
      keyHash(concat(lit("up:"), col(keyCol).cast("string"))) % 10000 <
        col("__factor") % 10000L,
      1L).otherwise(0L)
    df.withColumn("__factor", factor.cast("long"))
      .withColumn("__copies", expr("__factor div 10000") + extra)
      .withColumn("copy",
        explode(when(col("__copies") > 0,
            sequence(lit(0L), col("__copies") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__copies", "__factor")
  }

  /** Per-stratum keep RATES in permyriad (1/10000): a row survives iff
    * `hash(key) % 10000 < rate(stratum)` — the up/down-sampling mixer
    * of a training-data pipeline (keep 25% of English, all of a rare
    * language). The rate table is a literal when-chain, not a join:
    * typical mixes have tens of strata, and a broadcast join for a
    * 10-entry lookup is pure overhead. Deterministic per key: a row's
    * membership never flips as unrelated rows arrive, and raising a
    * stratum's rate only ADDS rows (nested samples — the property that
    * makes mix re-weighting reproducible). */
  def stratifiedRateSample(df: DataFrame, stratumCol: String, keyCol: String,
                           permyriad: Map[String, Int],
                           defaultPermyriad: Int = 0): DataFrame = {
    require((defaultPermyriad +: permyriad.values.toSeq)
      .forall(r => r >= 0 && r <= 10000), "rates must be in [0, 10000]")
    val rate = permyriad.toSeq.sortBy(_._1).foldRight(
      lit(defaultPermyriad): Column) { case ((s, r), acc) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(keyHash(col(keyCol)) % 10000 < rate)
  }

  /** Cumulative Poisson(1) distribution at 1e-9 resolution — STATED
    * integer constants (the Benford-table discipline: precomputed,
    * not engine-computed — `exp(-1)` in two libms can differ in the
    * last ulp and flip a threshold). `u < PoissonCum(w)` first holds
    * at weight w; u past the last threshold (p ≈ 1.1e-6) caps at 9. */
  val PoissonCum: Seq[Long] = Seq(367879441L, 735758882L, 919698602L,
    981011843L, 996340153L, 999405815L, 999916758L, 999989750L, 999998874L)

  /** Hash-Poisson bootstrap — error bars for a statistic at corpus
    * scale without ever materializing a resample: the classic "n out
    * of n with replacement" bootstrap is equivalent (as n grows) to
    * giving each row an independent Poisson(1) multiplicity per
    * replicate (the streaming/online bootstrap of Oza & Russell 2001;
    * the same device scales Kleiner et al.'s bag of little
    * bootstraps), and a hash of (row key, replicate id) makes those
    * multiplicities DETERMINISTIC — reproducible across runs,
    * partitionings, and engines, which is what lets DuckDB replay the
    * identical resamples (q209) where a `rand()` bootstrap could
    * never be gated.
    *
    * Returns one row per replicate: resampled row count (Σ weights)
    * and the weighted value sum (exact decimal — order-free). The
    * spread across replicates IS the sampling distribution of the
    * statistic; the caller reads percentiles off it for a CI. Shape:
    * one `replicates`-way row explode + one bounded aggregate — no
    * shuffle of the data beyond the final |replicates|-row combine,
    * map-side partials do the work. */
  /** Deterministic randomization test — the SIGNIFICANCE complement
    * to [[bootstrapStats]]'s error bars: is the observed A-vs-B mean
    * difference bigger than chance relabeling would produce? Each
    * replicate reassigns every row to A with probability n_A/n
    * via the md5 key-hash (the bootstrap's determinism device — the
    * "random" relabelings are a pure function of keys and replicate
    * ids, identical across runs, partitionings and engines), and the
    * p-value is the share of replicates at least as extreme, with
    * the standard +1 correction (Phipson & Smyth 2010: a permutation
    * p of zero is never valid).
    *
    * Exactness: mean differences are compared as CROSS PRODUCTS —
    * |s_A·n_B − s_B·n_A| on a shared denominator-free scale (the E77
    * drift discipline), DECIMAL(38,0)/HUGEINT intermediates, no
    * float division anywhere; a degenerate replicate (one side
    * empty) counts as extreme — conservative, stated.
    *
    * Shape: one totals aggregate, one rows×replicates explode + one
    * replicate-keyed aggregate (map-side partials collapse to R rows
    * per partition), one R-row fold. Replicates are the stated cost
    * knob. */
  def randomizationTest(df: DataFrame, keyCol: String, groupCol: String,
                        valueCol: String, groupA: String,
                        replicates: Int = 100): DataFrame = {
    require(replicates >= 1, "need at least one replicate")
    val base = df.select(col(keyCol).cast("string").as("__k"),
      (col(groupCol) === groupA).as("__isA"),
      col(valueCol).cast("long").as("__v"))
    val totals = base.agg(
      count(when(col("__isA"), 1)).as("na"),
      count(when(!col("__isA"), 1)).as("nb"),
      sum(when(col("__isA"), col("__v")).otherwise(0L))
        .cast("decimal(38,0)").as("sa"),
      sum(when(!col("__isA"), col("__v")).otherwise(0L))
        .cast("decimal(38,0)").as("sb"))
    val perRep = base
      .select(col("__k"), col("__v"),
        explode(sequence(lit(1), lit(replicates))).as("replicate"))
      .crossJoin(broadcast(totals))
      .withColumn("__assignA",
        keyHash(concat_ws("|", col("__k"), col("replicate").cast("string")))
          % (col("na") + col("nb")) < col("na"))
      .groupBy(col("replicate"))
      .agg(count(when(col("__assignA"), 1)).as("nar"),
        count(when(!col("__assignA"), 1)).as("nbr"),
        sum(when(col("__assignA"), col("__v")).otherwise(0L))
          .cast("decimal(38,0)").as("sar"),
        sum(when(!col("__assignA"), col("__v")).otherwise(0L))
          .cast("decimal(38,0)").as("sbr"))
    perRep.crossJoin(broadcast(totals))
      .withColumn("__extreme",
        abs(col("sar") * col("nbr") - col("sbr") * col("nar")) *
          (col("na") * col("nb")) >=
        abs(col("sa") * col("nb") - col("sb") * col("na")) *
          (col("nar") * col("nbr")))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        first(abs(col("sa") * col("nb") - col("sb") * col("na")))
          .cast("long").as("obs_num"),
        count(lit(1)).as("n_replicates"),
        count(when(col("__extreme"), 1)).as("n_extreme"))
      .withColumn("p_permille",
        expr("((n_extreme + 1) * 1000) div (n_replicates + 1)"))
  }

  def bootstrapStats(df: DataFrame, keyCol: String, valueCol: String,
                     replicates: Int = 20, sumScale: Int = 4): DataFrame = {
    require(replicates >= 1, "need at least one replicate")
    // scaleOut BEFORE the rows×R explode: the md5 per (row, replicate)
    // is the documented dominant cost, and a one-row-group input file
    // otherwise computes all of it in a single scan task (r19 opt,
    // guide §2.5; measured 1-task at local[4] on the sf0.1 bench)
    val rep = graft.core.Par.scaleOut(
        df.select(col(keyCol).cast("string").as("__k"), col(valueCol)))
      .select(col("__k"), col(valueCol),
        explode(sequence(lit(0), lit(replicates - 1))).as("replicate"))
    val u = keyHash(concat_ws("|", col("__k"), col("replicate").cast("string"))) %
      1000000000L
    val weight = PoissonCum.zipWithIndex.reverse
      .foldLeft(lit(9): Column) { case (acc, (t, w)) =>
        when(u < t, lit(w.toLong)).otherwise(acc)
      }
    rep.withColumn("__w", weight)
      .groupBy(col("replicate"))
      .agg(sum(col("__w")).as("n_resampled"),
        graft.core.Exact.exactSum(col(valueCol) * col("__w"), sumScale)
          .as("sum_value"))
  }

  /** Paired sign-flip permutation test — the significance step after
    * [[matchedCohort]], completing the observational trio (match →
    * estimate → test) the way [[randomizationTest]] serves randomized
    * A/B: under the paired null the treated/control labels WITHIN a
    * pair are exchangeable, so each replicate flips every pair's
    * difference sign by an md5 hash of (pair key, replicate) — the
    * bootstrap/randomization determinism device: "random" flips are a
    * pure function of keys, identical across runs, partitionings, and
    * engines — and the p-value is the Phipson–Smyth +1-corrected
    * share of replicates whose |Σ ±diff| reaches the observed |Σ
    * diff|. Everything is exact integers (differences in cents, sums
    * in longs, permille floor) — no float near the decision.
    *
    * Shape: one totals aggregate, one rows×R explode into an R-keyed
    * aggregate (map-side combined), two 1-row broadcasts. R is
    * config-sized; the explode is the documented cost, linear in
    * pairs·R. */
  def signFlipTest(pairs: DataFrame, keyCol: String, diffCol: String,
                   replicates: Int = 100): DataFrame = {
    require(replicates >= 1, "need at least one replicate")
    val d = pairs.select(col(keyCol).cast("string").as("__k"),
      col(diffCol).as("__d"))
    val obs = d.agg(sum(col("__d")).as("sum_diff"),
      count(lit(1)).as("n_pairs"))
    val reps = d
      .withColumn("rep", explode(sequence(lit(1), lit(replicates))))
      .withColumn("__sign",
        when(keyHash(concat_ws("|", col("__k"),
          col("rep").cast("string"))) % 2 === 0, 1L).otherwise(-1L))
      .groupBy(col("rep"))
      .agg(sum(col("__sign") * col("__d")).as("__sr"))
    val ext = reps.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_replicates"),
        sum(when(abs(col("__sr")) >= abs(col("sum_diff")), 1L)
          .otherwise(0L)).as("n_extreme"))
    obs.crossJoin(broadcast(ext))
      .select(col("n_pairs"), col("sum_diff"), col("n_replicates"),
        col("n_extreme"),
        expr("(1000 * (n_extreme + 1)) div (n_replicates + 1)")
          .as("p_permille"))
  }

  /** Matched-cohort construction — the observational-comparison prep
    * that [[randomizationTest]] assumes away (a randomized assignment
    * needs no matching; a FOUND treatment group does): pair each
    * treated row 1:1 with a control row from the SAME stratum band
    * (a score/propensity band, a demographic cell), so the compared
    * groups share the band distribution by construction. Greedy
    * rank-pairing inside each band: the i-th treated (by id) matches
    * the i-th control (by id) — a deterministic total order, so runs
    * and engines agree — and the excess side's tail goes unmatched
    * (dropped, stated: padding controls in from other bands is
    * exactly the bias matching exists to remove).
    *
    * Shape: one rank window per (band, arm) — partition-bounded, no
    * global sort — and one (band, rank) equi-join; output is
    * min(treated, control) rows per band. The banding expression is
    * the caller's contract (integer bands from exact arithmetic —
    * the [[graft.analytics.Profiling.quantileNormalize]] discipline —
    * keep it engine-stable). */
  def matchedCohort(df: DataFrame, idCol: String, treatedCol: String,
                    bandCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bandCol), col(treatedCol)).orderBy(col(idCol))
    val ranked = df.select(col(idCol), col(treatedCol), col(bandCol))
      .withColumn("pair_rank", row_number().over(w).cast("long"))
    val t = ranked.filter(col(treatedCol))
      .select(col(bandCol), col("pair_rank"), col(idCol).as("treated_id"))
    val c = ranked.filter(!col(treatedCol))
      .select(col(bandCol), col("pair_rank"), col(idCol).as("control_id"))
    t.join(c, Seq(bandCol, "pair_rank"))
      .select(col(bandCol), col("pair_rank"), col("treated_id"),
        col("control_id"))
  }

  /** Deterministic hash negative sampling (the contrastive-training
    * data step; word2vec's negative sampling, Mikolov et al. 2013,
    * with the engine's determinism discipline in place of an RNG):
    * per (anchor, positive) pair, `k` negatives drawn uniformly from
    * the id universe as a PURE FUNCTION of (anchor, pos, slot) — the
    * E201 bootstrap device, so every run / partitioning / engine
    * draws the identical negatives and a training set is
    * reproducible from its spec. Draw = keyHash(anchor|pos|slot) mod
    * N mapped to the slot-target'th universe id via the E223
    * distributed global row index (ids need not be contiguous).
    * Accidental hits (negative = the anchor or the positive) are
    * DROPPED, not redrawn (redraw chains make determinism
    * conditional; expected loss 2k/N, stated) — collision-tolerant
    * losses (InfoNCE) expect exactly this.
    *
    * Shape: positives × k explode, one 1-row count broadcast, one
    * hash join on the slot target against the indexed universe —
    * no global sort beyond the index's range partition. */
  def negativeSamples(positives: DataFrame, universe: DataFrame,
                      anchorCol: String = "anchor_id",
                      posCol: String = "pos_id",
                      idCol: String = "vec_id", k: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val idx = graft.etl.Packing.globalRowIndex(
        universe.select(col(idCol)).distinct(), Seq(idCol), "__gidx")
      .select((col("__gidx") - 1).as("__target"), col(idCol).as("neg_id"))
    val total = idx.agg(count(lit(1)).as("__n"))
    positives.select(col(anchorCol), col(posCol))
      .withColumn("slot", explode(array((1 to k).map(lit): _*)))
      .crossJoin(broadcast(total))
      .withColumn("__target",
        pmod(keyHash(concat_ws("|", col(anchorCol), col(posCol),
          col("slot"))), col("__n")))
      .join(idx, Seq("__target"))
      .filter(col("neg_id") =!= col(anchorCol) &&
        col("neg_id") =!= col(posCol))
      .select(col(anchorCol), col(posCol), col("slot"), col("neg_id"))
  }

  /** Largest-remainder proportional quota sample — the EXACT-TOTAL
    * complement to [[stratifiedSample]]'s fixed-k and
    * [[stratifiedRateSample]]'s fixed-rate: draw exactly `total`
    * rows, split across classes proportionally to their counts with
    * Hamilton rounding (base = (T·n_c) div N, leftover units to the
    * largest remainders, class-name tiebreak — the E273 allocation
    * arithmetic applied to sampling), then per class the quota rows
    * with the smallest keyHash(id) (hash order = the frozen
    * deterministic "random" every sampler here uses). A class whose
    * quota exceeds its population contributes all it has (only
    * possible at T ≥ N; the shortfall is the honest answer, stated).
    *
    * Shape: one class-count aggregate, quota arithmetic on the
    * BOUNDED class table (windows over classes, not rows), one
    * broadcast quota join + one per-class rank window. The quota is
    * a COLUMN, so Catalyst's constant-limit top-k rewrite
    * (InferWindowGroupLimit) cannot fire — when one global cap fits,
    * [[quotaPerGroup]]'s literal k is the cheaper path; this
    * operator's contract is the exact total, which needs per-class
    * quotas. */
  def proportionalQuotaSample(df: DataFrame, classCol: String,
                              idCol: String, total: Long): DataFrame = {
    require(total >= 1, "total must be >= 1")
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__nc"))
    val tot = counts.agg(sum(col("__nc")).as("__n"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__base", expr(s"(${total}L * __nc) div __n"))
      .withColumn("__rem", expr(s"(${total}L * __nc) % __n"))
    val leftover = based.agg((lit(total) - sum(col("__base"))).as("__left"))
    val quotas = based.crossJoin(broadcast(leftover))
      .withColumn("__rr", row_number().over(
        Window.orderBy(col("__rem").desc, col(classCol))))
      .withColumn("__quota",
        col("__base") + when(col("__rr") <= col("__left"), 1L).otherwise(0L))
      .select(col(classCol), col("__quota"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(keyHash(col(idCol)), col(idCol))
    df.join(broadcast(quotas), Seq(classCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Benjamini–Hochberg step-up FDR correction (Benjamini & Hochberg,
    * JRSS-B 1995) — the multiple-testing gate every screen that runs
    * [[randomizationTest]] / permutation tests PER SEGMENT owes its
    * readers: at 1,000 hypotheses and α = 5%, ~50 "significant"
    * results are expected from pure noise; BH bounds the FALSE
    * DISCOVERY RATE instead of Bonferroni's family-wise rate, keeping
    * power at scale. Step-up rule: sort p ascending, k* = max{k :
    * p_(k) ≤ k·α/m}, reject every test with p ≤ p_(k*) — including
    * tests that FAIL their own rank's threshold (the signature
    * step-up behavior, spec-pinned).
    *
    * Exact integers: p-values arrive in permille; the comparison
    * p_(k) ≤ k·α/m runs as p·m ≤ k·α_permille in BIGINT (multiply,
    * never divide); ties in p rank by (p, id) but the REJECTION SET
    * is tie-independent (rejection tests p ≤ p*, never the rank).
    *
    * Scale contract: the input is one row per HYPOTHESIS — a
    * config-bounded table (the E158 "output bounded by users"
    * inversion: bounded INPUT), so the global rank window is a
    * deliberate single-partition pass over thousands of rows, stated
    * here rather than hidden (the per-row work upstream — computing
    * each p-value — is where the data-scale cost lives). */
  def bhCorrection(tests: DataFrame, idCol: String, pCol: String,
                   alphaPermille: Long = 50L): DataFrame = {
    require(alphaPermille >= 1 && alphaPermille <= 1000,
      "alphaPermille must be in [1, 1000]")
    val ranked = tests
      .select(col(idCol), col(pCol).cast("long").as("p_permille"))
      .withColumn("p_rank", row_number().over(
        Window.orderBy(col("p_permille"), col(idCol))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
    val pstar = ranked
      .filter(col("p_permille") * col("m") <=
        col("p_rank") * lit(alphaPermille))
      .agg(coalesce(max(col("p_permille")), lit(-1L)).as("__pstar"))
    ranked.crossJoin(broadcast(pstar))
      .select(col(idCol), col("p_permille"), col("p_rank"), col("m"),
        (col("p_permille") <= col("__pstar")).as("rejected"))
  }

  /** Weighted fair interleave — materializing the ORDER a ratio-mixed
    * training stream is consumed in (stride scheduling, Waldspurger &
    * Weihl OSDI 1995; the WFQ virtual-time device, Demers, Keshav &
    * Shenker SIGCOMM 1989): E64/E263 decide HOW MUCH of each source
    * to take; this decides WHEN, so every prefix of the stream tracks
    * the target ratios — a trainer that stops early (or an epoch
    * boundary that lands mid-stream) still saw the intended mixture,
    * where concat-by-source would feed it one source at a time.
    *
    * Per source, items take their frozen hash order (keyHash — the
    * sampler convention) and index i = 1, 2, …; item i of source s
    * gets virtual time vt = (2i−1)·10^6 div (2·w_s) — the stride
    * midpoint, quantized at a stated 10^-6 resolution (exact WFQ
    * compares (2i−1)/w_s as rationals; the e6 floor is deterministic
    * in both engines and ties break by (source, id), so the schedule
    * is total and reproducible — and (2i−1)·10^6 bounds i below
    * ~4.6·10^12 per source in int64, stated loud). Global positions
    * come from E223's distributed range-partitioned index over
    * (vt, source, id) — no single-partition window.
    *
    * Shape: one per-source rank window, one projection, one
    * repartitionByRange + bounded offset table (the E223 cost). */
  def weightedInterleave(df: DataFrame, sourceCol: String, idCol: String,
                         weightCol: String): DataFrame = {
    val indexed = df
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(keyHash(col(idCol)), col(idCol))))
      .withColumn("__vt",
        expr(s"CASE WHEN $weightCol <= 0 THEN " +
          "raise_error('weightedInterleave: non-positive weight') " +
          "ELSE ((2 * CAST(__i AS BIGINT) - 1) * 1000000L)" +
          s" div (2 * $weightCol) END"))
    graft.etl.Packing.globalRowIndex(
        indexed.withColumnRenamed(sourceCol, "__src")
          .withColumnRenamed(idCol, "__id"),
        Seq("__vt", "__src", "__id"), "position")
      .select(col("position"),
        col("__src").as(sourceCol), col("__id").as(idCol),
        col("__vt").as("vt"), col("__i").cast("long").as("source_idx"))
  }

  /** Preference-pair construction for reward-model / DPO training
    * (Stiennon et al. 2020, arXiv:2009.01325; Ouyang et al. 2022,
    * arXiv:2203.02155) — the post-training data-assembly step the
    * curation shelf was missing: given scored candidates grouped by
    * prompt (or any group key), pair each group's BEST candidate
    * against its worst candidates, keeping only pairs whose score gap
    * clears `minGap` (a pair the scorer can barely separate teaches
    * the reward model noise — the published pipelines filter on
    * separation for exactly this reason).
    *
    * Semantics, all deterministic: chosen = the group's max score,
    * ties to the smallest id; rejected = candidates with score ≤
    * chosen − minGap (the chosen row itself is always excluded),
    * lowest score first, ties to the smallest id, at most
    * `maxRejected` per group (best-vs-worst pairing — the widest
    * usable gaps first). A group whose runner-ups all sit inside the
    * gap yields no pairs — the honest empty answer, not a forced
    * noisy pair.
    *
    * Shape: one per-group top-1 window (WindowGroupLimit — literal
    * k = 1), one group-keyed equi-join back (co-partitioned with the
    * window's shuffle — no second exchange), one ascending rank
    * window on the co-partitioned result (sort only). Per-group work
    * is |group| log |group|; nothing crosses groups, so the operator
    * scales with the number of candidates, not their pairings. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String, minGap: Long = 1L,
                      maxRejected: Int = 3): DataFrame = {
    require(minGap >= 0, "minGap must be >= 0")
    require(maxRejected >= 1, "maxRejected must be >= 1")
    val wBest = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val chosen = df
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(idCol).as("chosen_id"),
        col(scoreCol).cast("long").as("chosen_score"))
    df.select(col(groupCol), col(idCol).as("rejected_id"),
        col(scoreCol).cast("long").as("rejected_score"))
      .join(chosen, Seq(groupCol))
      .filter(col("rejected_id") =!= col("chosen_id") &&
        col("rejected_score") <= col("chosen_score") - lit(minGap))
      .withColumn("pair_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("rejected_score").asc, col("rejected_id").asc)))
      .filter(col("pair_rank") <= maxRejected)
      .select(col(groupCol), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("gap"),
        col("pair_rank"))
  }
}
