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
}
