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

  /** Engine-neutral American Soundex (Russell & Odell, US patents
    * 1918/1922; the archival/census standard) — the PHONETIC blocking
    * key the ER family lacked: [[typoPairs]] catches keyboard slips
    * (edit distance), Soundex catches sound-alike spellings
    * (Smith/Smyth, Robert/Rupert → same code) that can sit many edits
    * apart. Use as an [[snmPairs]] pass key or a direct blocking
    * equi-join key.
    *
    * Deliberately NOT Spark's built-in `soundex()`: that follows
    * commons-codec's corner behaviors (non-letter handling, H/W
    * treatment) which no other engine replays exactly; this is the
    * textbook algorithm composed from codegen'd builtins BOTH engines
    * evaluate identically — translate + per-digit run collapse
    * (seven fixed regexes; RE2 has no backreferences, so `(\d)\1+` is
    * off the table — stated), zero UDF:
    *  1. uppercase, strip non-letters (empty → NULL);
    *  2. map every letter: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6,
    *     vowels+Y→0, H/W DELETED (translate's short-replacement
    *     delete) — deletion makes codes adjacent, which IS the
    *     rule that same codes across h/w collapse while a vowel
    *     (the surviving 0) separates them;
    *  3. collapse each digit's runs, drop the 0s;
    *  4. keep the original first letter; drop the leading code digit
    *     iff the first letter is a coded consonant (its own code);
    *  5. first letter + first 3 remaining digits, 0-padded to 4.
    */
  def soundexKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val letters = regexp_replace(upper(c), "[^A-Z]", "")
    val first = substring(letters, 1, 1)
    val coded = translate(letters,
      "BFPVCGJKQSXZDTLMNRAEIOUYHW", "111122222222334556000000")
    val collapsed = (0 to 6).foldLeft(coded) { (s, d) =>
      regexp_replace(s, s"$d$d+", s"$d")
    }
    val stripped = replace(collapsed, lit("0"), lit(""))
    val dropped = when(
      first.isin("A", "E", "I", "O", "U", "Y", "H", "W"), stripped)
      .otherwise(stripped.substr(lit(2), length(stripped)))
    when(length(letters) === 0, lit(null).cast("string"))
      .otherwise(rpad(concat(first, substring(dropped, 1, 3)), 4, "0"))
  }

  /** Phonetic conflation report over a corpus vocabulary — the E280
    * stemConflation shape with [[soundexKey]] as the conflator: one
    * row per code with the distinct word forms that share it (sorted
    * comma-joined, the engine-neutral convention), form count, and
    * total corpus occurrences. Emits singleton codes too — the full
    * vocabulary partition, so every word's code assignment is pinned
    * by the oracle hash. Vocabulary-bounded throughout. */
  def soundexConflation(df: DataFrame, textCol: String): DataFrame =
    vocab(df, textCol)
      .withColumn("code", soundexKey(col("word")))
      .filter(col("code").isNotNull)
      .groupBy(col("code"))
      .agg(count(lit(1)).as("n_forms"),
        sum(col("freq")).as("n_occurrences"),
        array_join(sort_array(collect_list(col("word"))), ",").as("forms"))

  /** Multi-pass sorted-neighborhood record linkage (Hernández &
    * Stolfo, SIGMOD 1995) — the RECORD-level companion to
    * [[typoPairs]]' word-level deletion blocking: sort all records by
    * a blocking key, slide a `window`-record neighborhood, verify the
    * candidate pairs with exact edit distance. One pass misses dirty
    * values whose corruption falls EARLY in its key (the record sorts
    * away from its twin), so production SNM runs several passes with
    * complementary keys — e.g. the field and its reversal — and
    * unions the candidates; the spec pins exactly that failure/rescue
    * on a typo the forward key misses and the reversed key catches.
    *
    * Scale shape: the global sort is [[Packing.globalRowIndex]]'s
    * range-partition + per-partition rank + broadcast offsets — NOT a
    * single-task global window. Candidates are (window−1)·n per pass
    * — LINEAR in the corpus where all-pairs is quadratic — generated
    * by an offset explode + rank equi-join (no range join). The
    * verify uses Spark's bounded `levenshtein(a, b, maxDist)`
    * (early-exit, codegen'd); kept pairs carry the true distance, so
    * the unbounded oracle twin agrees row-for-row. Pairs are
    * normalized (rec_a < rec_b) and deduped across passes/offsets.
    * The sort key is the recall contract — the operator supplies the
    * machinery; key design stays with the caller, as in every SNM
    * deployment. */
  def snmPairs(records: DataFrame, idCol: String, nameCol: String,
               passKeys: Seq[org.apache.spark.sql.Column],
               window: Int = 4, maxDist: Int = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(passKeys.nonEmpty, "at least one pass key required")
    val passes = passKeys.map { key =>
      // the key expression is evaluated against the caller's frame
      // (it references the caller's column names), before renaming
      val base = records
        .filter(col(idCol).isNotNull && col(nameCol).isNotNull)
        .select(col(idCol).as("__id"), col(nameCol).as("__nm"),
          key.cast("string").as("__key"))
      val idx = Packing.globalRowIndex(base,
        Seq("__key", "__nm", "__id"), "__rnk")
      val a = idx.select(col("__id").as("id_a"), col("__nm").as("nm_a"),
          col("__rnk"),
          explode(sequence(lit(1), lit(window - 1))).as("__off"))
        .withColumn("__rnk_b", col("__rnk") + col("__off"))
      val b = idx.select(col("__id").as("id_b"), col("__nm").as("nm_b"),
        col("__rnk").as("__rnk_b"))
      a.join(b, "__rnk_b")
        .select(col("id_a"), col("nm_a"), col("id_b"), col("nm_b"))
    }
    val cands = passes.reduce(_ unionAll _)
      .select(
        when(col("id_a") < col("id_b"), col("id_a"))
          .otherwise(col("id_b")).as("rec_a"),
        when(col("id_a") < col("id_b"), col("id_b"))
          .otherwise(col("id_a")).as("rec_b"),
        when(col("id_a") < col("id_b"), col("nm_a"))
          .otherwise(col("nm_b")).as("name_a"),
        when(col("id_a") < col("id_b"), col("nm_b"))
          .otherwise(col("nm_a")).as("name_b"))
      .filter(col("rec_a") =!= col("rec_b"))
      .distinct()
    cands
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select("rec_a", "rec_b", "name_a", "name_b", "dist")
  }
}
