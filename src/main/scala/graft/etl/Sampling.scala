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
}
