package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter,
  * JASA 1969) — the principled WEIGHT model on top of the candidate
  * machinery this package already has ([[FuzzyMatch.snmPairs]]
  * blocking, levenshtein verify): each compared field contributes
  * log2(m/u) evidence when it agrees and log2((1−m)/(1−u)) when it
  * disagrees (m = P(agree | match), u = P(agree | non-match)), the
  * total is the pair's log-likelihood ratio, and two thresholds cut
  * it into link / possible-link / non-link — the decision rule the
  * paper proves optimal at fixed error rates. This is what separates
  * "the names are 1 edit apart" (one weak bit on a uniform catalog)
  * from "name AND nation AND segment AND balance all agree"
  * (overwhelming), which no single-field distance cut can express.
  *
  * Exactness contract (the normalCutsPermille shared-constant
  * device): m/u arrive as PERMILLE integers (config — production
  * estimates them via EM, Winkler 1988; out of scope, stated), and
  * each field's two weights are computed ONCE driver-side in
  * MILLI-BITS ([[weightMilliBits]] — the only libm call, per field
  * not per row) and interpolated into both engines' plans as integer
  * literals. Query-time scoring is a pure BIGINT sum of shared
  * constants — bit-identical cross-engine, no float drift.
  *
  * Missing comparisons (NULL agreement) contribute ZERO evidence —
  * the F-S convention for unobservable fields — so a pair with one
  * unknowable field still classifies on the others.
  *
  * Scale shape: a pure projection over the candidate-pair frame —
  * the pair volume is the BLOCKING stage's contract (snmPairs is
  * linear in records); scoring adds no shuffle.
  */
object RecordLinkage {

  /** Agreement weight in milli-bits: round(log2(num/den) · 1000).
    * Driver-side only; the result is the shared integer constant. */
  def weightMilliBits(numPermille: Int, denPermille: Int): Long =
    Math.round(Math.log(numPermille.toDouble / denPermille) /
      Math.log(2.0) * 1000.0)

  /** One compared field: its agreement column is `agr_<name>` on the
    * pairs frame; m/u in permille with 0 < u < m < 1000 (agreement
    * must be MORE likely under a match, or the field carries no
    * signal in this direction). */
  case class FsField(name: String, mPermille: Int, uPermille: Int) {
    require(uPermille > 0 && mPermille < 1000 && uPermille < mPermille,
      s"field $name needs 0 < u < m < 1000, got m=$mPermille u=$uPermille")
    def agreeWeight: Long = weightMilliBits(mPermille, uPermille)
    def disagreeWeight: Long =
      weightMilliBits(1000 - mPermille, 1000 - uPermille)
  }

  /** The q353 demo configuration over the dirty-customer fixture —
    * m/u chosen for THAT catalog's honest base rates (name-edit-1
    * agreement is common among sorted-neighborhood candidates on a
    * serial-number catalog, hence the weak 950/600; nation is 1-in-25
    * under non-match, segment 1-in-5, equal-balance is the near-
    * certain discriminator). Shared verbatim with the DuckDB twin. */
  val demoFields: Seq[FsField] = Seq(
    FsField("name", 950, 600),
    FsField("nation", 990, 40),
    FsField("segment", 700, 200),
    FsField("bal", 990, 10))

  /** Score + classify candidate pairs. `pairs` carries one boolean
    * `agr_<field.name>` column per configured field; appends
    * `score_millibits` (BIGINT sum of the shared per-field constants;
    * NULL agreements contribute 0) and `verdict` ('match' at ≥
    * `upperMilliBits`, 'non_match' at ≤ `lowerMilliBits`, 'possible'
    * between — the paper's three-way rule). */
  def fellegiSunterScores(pairs: DataFrame, fields: Seq[FsField],
                          upperMilliBits: Long,
                          lowerMilliBits: Long): DataFrame = {
    require(fields.nonEmpty, "at least one field required")
    require(fields.map(_.name).distinct.size == fields.size,
      "field names must be distinct")
    require(lowerMilliBits < upperMilliBits,
      "lower threshold must sit below upper")
    val score = fields.map { f =>
      when(col(s"agr_${f.name}").isNull, lit(0L))
        .when(col(s"agr_${f.name}"), lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    pairs
      .withColumn("score_millibits", score)
      .withColumn("verdict",
        when(col("score_millibits") >= upperMilliBits, lit("match"))
          .when(col("score_millibits") <= lowerMilliBits, lit("non_match"))
          .otherwise(lit("possible")))
  }
}
