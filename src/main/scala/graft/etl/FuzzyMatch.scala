package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching for entity resolution / typo detection: find
  * every pair of distinct vocabulary words within edit distance 1,
  * without the O(|V|²) all-pairs levenshtein a naive approach needs.
  *
  * Blocking is the SymSpell deletion neighborhood (Garbe's symmetric
  * delete algorithm): each word generates itself plus its
  * single-character deletions; two words are within edit distance 1
  * IFF they share a variant (substitution → delete the differing
  * position from both; insertion/deletion → the longer word's
  * deletion hits the shorter word itself) — so the block join has
  * PERFECT recall and `levenshtein` runs only on candidates, as the
  * exact verification. Everything runs on the word-TYPE table: the
  * corpus contributes one count pass, the variant join shuffles
  * (len+1)·|V| short strings regardless of corpus size, and bucket
  * skew is bounded by the variant fan-in, not data volume. Deeper
  * distances extend the same scheme with depth-d deletion
  * neighborhoods (SymSpell's d=2 form) — not needed here.
  *
  * Output pairs carry both words' corpus frequencies: the standard
  * typo heuristic reads the rare side as the misspelling of the
  * frequent side.
  */
object FuzzyMatch {

  /** Space-separated word frequencies (the `p_name`-style pre-cleaned
    * column; for raw text run [[graft.text.TextAnalysis.tokens]]
    * first). */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The word plus each single-character deletion. The transform
    * lambda is interpreted, but it runs once per word TYPE — never on
    * corpus rows. */
  private def withVariants(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      explode(concat(array(col("word")),
        expr("transform(sequence(1, length(word)), i -> " +
          "concat(substring(word, 1, i-1), substring(word, i+1, length(word))))")))
        .as("variant"))

  /** All distinct word pairs at exactly edit distance 1 (a < b), with
    * corpus frequencies. */
  def typoPairs(df: DataFrame, textCol: String): DataFrame = {
    val v = withVariants(vocab(df, textCol))
    v.as("a").join(v.as("b"),
        col("a.variant") === col("b.variant") &&
          col("a.word") < col("b.word"))
      .select(col("a.word").as("word_a"), col("b.word").as("word_b"),
        col("a.freq").as("freq_a"), col("b.freq").as("freq_b"))
      .distinct()
      .filter(levenshtein(col("word_a"), col("word_b")) === 1)
  }
}
