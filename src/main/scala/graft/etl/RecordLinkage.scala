package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-pattern match posterior P(M | γ) for every agreement pattern
    * γ ∈ 0..2^k−1 (bit j = field j agrees), computed ONCE driver-side
    * from the permille config in EXACT integer arithmetic — numerator
    * p·Π(m-terms) and denominator term (1000−p)·Π(u-terms) stay
    * ≤ 1000^(k+1) ≤ 1e15·2 < 2^63 for k ≤ 4 — with a single double
    * division at the end. These are the shared constants both engines
    * interpolate (the milli-bit weight device extended to the EM
    * posterior). */
  def posteriorWeights(fields: Seq[FsField], priorPermille: Int): Seq[Double] = {
    require(priorPermille > 0 && priorPermille < 1000,
      s"prior must be in (0, 1000) permille, got $priorPermille")
    require(fields.size <= 4, "posterior integer bound holds for <= 4 fields")
    (0 until (1 << fields.size)).map { g =>
      var a = priorPermille.toLong
      var b = (1000 - priorPermille).toLong
      fields.zipWithIndex.foreach { case (f, j) =>
        val agree = ((g >> j) & 1) == 1
        a *= (if (agree) f.mPermille else 1000 - f.mPermille)
        b *= (if (agree) f.uPermille else 1000 - f.uPermille)
      }
      a.toDouble / (a + b).toDouble
    }
  }

  /** ONE exact-counted EM iteration for the m/u/prior estimates
    * (Winkler 1988; the E-M fit the [[fellegiSunterScores]] doc
    * points at) — the estimation step expressed as one aggregate:
    * the 2^k agreement-pattern counts n(γ) are exact BIGINTs computed
    * in a SINGLE hash-aggregate row (no groupBy — the pattern space
    * is config-bounded), the per-pattern posteriors w(γ) ride in as
    * [[posteriorWeights]] literals, and the updates
    * m_j' = Σ_{γ∋j} n·w / Σ n·w (u_j' with 1−w, prior' = Σ n·w / N)
    * are FIXED-ORDER scalar double trees over (count × literal)
    * terms — bit-identical cross-engine under any partitioning (the
    * q62 one-double device; the fold order 0..2^k−1 is part of the
    * contract and the twin mirrors it textually). Iterating to
    * convergence is a driver loop over this step (the k-means/BPE
    * precedent); pairs with any NULL agreement are excluded from the
    * estimation, stated.
    * @return one row per field (component, m_permille, u_permille as
    *         doubles) + a ('prior', p', NULL) row. */
  def emStep(pairs: DataFrame, fields: Seq[FsField],
             priorPermille: Int): DataFrame = {
    require(fields.nonEmpty && fields.size <= 4,
      "1..4 fields (the posterior integer bound)")
    val k = fields.size
    val m = 1 << k
    val w = posteriorWeights(fields, priorPermille)
    val pat = fields.zipWithIndex.map { case (f, j) =>
      when(col(s"agr_${f.name}"), lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val nonNull = fields.map(f => col(s"agr_${f.name}").isNotNull)
      .reduce(_ && _)
    val counts = pairs.filter(nonNull).select(pat.as("__g"))
      .agg(
        sum(when(col("__g") === 0, 1L).otherwise(0L)).as("n0"),
        (1 until m).map(g =>
          sum(when(col("__g") === g, 1L).otherwise(0L)).as(s"n$g")): _*)
    def fold(terms: Seq[Column]): Column = terms.reduce(_ + _)
    def n(g: Int): Column = col(s"n$g").cast("double")
    val nW = fold((0 until m).map(g => n(g) * lit(w(g))))
    val nU = fold((0 until m).map(g => n(g) * lit(1.0 - w(g))))
    val nAll = fold((0 until m).map(g => n(g)))
    val fieldRows = fields.zipWithIndex.map { case (f, j) =>
      val mNum = fold((0 until m).filter(g => ((g >> j) & 1) == 1)
        .map(g => n(g) * lit(w(g))))
      val uNum = fold((0 until m).filter(g => ((g >> j) & 1) == 1)
        .map(g => n(g) * lit(1.0 - w(g))))
      counts.select(lit(f.name).as("component"),
        (mNum / nW * 1000.0).as("m_permille"),
        (uNum / nU * 1000.0).as("u_permille"))
    }
    val priorRow = counts.select(lit("prior").as("component"),
      (nW / nAll * 1000.0).as("m_permille"),
      lit(null).cast("double").as("u_permille"))
    (fieldRows :+ priorRow).reduce(_ unionAll _)
  }

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
