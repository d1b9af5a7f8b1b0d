package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MultiMatchFunctions

/** Dictionary blocklist scan + gate over a document corpus — the C4
  * "bad words" filter class (Raffel et al. 2020 drop any page with a
  * blocklist hit; production pipelines usually threshold instead),
  * built on the [[graft.functions.AhoCorasick]] automaton: ONE text
  * pass for the whole dictionary, O(chars + matches), where the
  * regex-per-term plan rescans the text once per term.
  *
  * Counting semantics are the automaton's stated leftmost-greedy
  * non-overlapping counts (the SQL `replace`-count identity — the
  * oracle-replayable choice); case is normalized by lowering BOTH
  * sides here, the piiScan convention. Everything is a pure
  * projection + explode: the text never shuffles, and at corpus scale
  * the scan is embarrassingly parallel.
  */
object Blocklist {

  /** Demo dictionary over the fixture vocabulary — chosen to exercise
    * the matcher's corners, not to moderate content: a self-
    * overlapping term ("a a"), a term that is a strict prefix of
    * another ("row" / "row scan"), a 3-word phrase, and a never-hits
    * control ("zebra"). All lowercase (the scan lowers text). */
  val defaultTerms: Seq[String] =
    Seq("a a", "row", "row scan", "scan slow fast", "slow", "zebra")

  /** Per-(doc, term) hit counts, terms with zero hits omitted.
    * NULL text contributes no rows (explode of NULL drops — same as
    * the twin's n_hits > 0 cut on a NULL count). */
  def blocklistScan(docs: DataFrame, terms: Seq[String] = defaultTerms,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val lowered = terms.map(_.toLowerCase)
    require(lowered.distinct.size == lowered.size,
      "terms must be distinct after lowering")
    val termArr = array(lowered.map(lit): _*)
    docs
      .select(col(idCol),
        posexplode(MultiMatchFunctions.multiMatchCounts(
          lower(col(textCol)), lowered)).as(Seq("__i", "n_hits")))
      .filter(col("n_hits") > 0)
      .select(col(idCol),
        element_at(termArr, col("__i") + 1).as("term"),
        col("n_hits"))
  }

  /** Per-doc keep/drop verdict: total hits across the dictionary,
    * number of distinct terms hit, keep = total ≤ `maxHits` (maxHits
    * = 0 is the C4 any-hit-drops policy). NULL text counts as zero
    * hits — a gate must emit a verdict for every row, stated. */
  def blocklistGate(docs: DataFrame, terms: Seq[String] = defaultTerms,
                    maxHits: Long = 0L, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val lowered = terms.map(_.toLowerCase)
    require(lowered.distinct.size == lowered.size,
      "terms must be distinct after lowering")
    val counts = coalesce(
      MultiMatchFunctions.multiMatchCounts(lower(col(textCol)), lowered),
      array_repeat(lit(0L), terms.size))
    docs
      .select(col(idCol), counts.as("__c"))
      .select(col(idCol),
        aggregate(col("__c"), lit(0L), (a, x) => a + x).as("n_hits_total"),
        size(filter(col("__c"), _ > 0)).cast("long").as("n_terms_hit"))
      .withColumn("keep", col("n_hits_total") <= maxHits)
  }
}
