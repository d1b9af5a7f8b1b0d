package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe categorical feature encoding. Target (mean) encoding
  * replaces a high-cardinality category with the mean of the label
  * inside that category — powerful, and a classic leakage bug when a
  * row's own label flows into its own feature (the feature "predicts"
  * perfectly in training, collapses in production). Leave-one-out
  * encoding (Micci-Barreca, SIGKDD Expl. 2001 lineage) excludes the
  * row itself: enc(row) = (Σ_cat target − target(row)) / (n_cat − 1)
  * — the same discipline E120's purged folds apply at the split
  * level, applied at the feature level.
  *
  * Exact integers: the target is integral (cents / counts), the
  * encoding a floor division of nonnegative terms — engines agree
  * without a float anywhere. Singleton categories (n = 1) emit NULL:
  * there is no leave-one-out evidence, and imputing the global prior
  * silently is the kind of default that poisons ablations — the
  * caller chooses (the smoothed variant (Σ−t+m·prior)/(n−1+m) is the
  * stated extension, one more broadcast scalar).
  *
  * Shape: one map-side-combined aggregate to the category stats table
  * (bounded by the category domain, NOT the corpus) joined back onto
  * the rows — two scans total, no window over the raw data: a hot
  * category costs nothing extra because partial aggregation collapses
  * it before the shuffle, where the per-category-window formulation
  * funnels every hot-category row through one task. */
object Encoding {

  /** Adds `loo_<targetCol>` beside each row's category and target.
    * `targetCol` must be integral (cast cents upstream — round before
    * the cast, per the determinism checklist). */
  def looEncode(df: DataFrame, catCol: String,
                targetCol: String): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(sum(col(targetCol)).as("__s"), count(col(targetCol)).as("__n"))
    df.join(stats, catCol)
      .withColumn(s"loo_$targetCol",
        when(col("__n") > 1,
          expr(s"(__s - $targetCol) div (__n - 1)")))
      .drop("__s", "__n")
  }
}
