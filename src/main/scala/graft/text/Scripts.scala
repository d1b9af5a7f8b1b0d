package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unicode script detection — the routing pass a multilingual corpus
  * runs before any language-specific processing: the n-gram language
  * heuristic ([[TextAnalysis]] E3) only makes sense WITHIN a script,
  * and script mixture itself is a quality signal (Latin prose stuffed
  * with CJK spam, mojibake, bidi-spoofing). Counts characters per
  * major Unicode block family with codegen'd `regexp_count` over
  * explicit code-point ranges (`\x{…}` syntax — identical in Java
  * regex and RE2, so the DuckDB oracle runs the very same patterns),
  * then picks the dominant script by a fixed-order CASE chain —
  * deterministic under ties, no argmax.
  *
  * Zero shuffle: one scan-side projection per document; the counts
  * are small integers and `dom_permille` is exact integer arithmetic
  * (×1000 before the single division). Docs with no letters in any
  * counted script surface as dominant='none' with dom_permille NULL —
  * distinguishable from a confident low-mixture doc. */
object Scripts {

  /** (name, code-point ranges) in DOMINANCE ORDER — the tie-break is
    * this list's order, part of the operator contract. */
  val families: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "hebrew" -> "[\\x{0590}-\\x{05FF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
    "kana" -> "[\\x{3040}-\\x{30FF}]")

  /** Confusable homoglyph table — the common Cyrillic/Greek letters
    * that render identically to Latin (the UTS #39 confusables data,
    * restricted to the high-frequency single-char mappings a spoof
    * actually uses): lowercase а е о р с у х і ѕ ј + Greek ο ν, and
    * uppercase А В Е К М Н О Р С Т Х. `skeletonFrom(i)` maps to
    * `skeletonTo(i)`. A STATED table, not a heuristic — auditable
    * like [[TextAnalysis.piiPatterns]]. */
  val skeletonFrom: String =
    "\u0430\u0435\u043e\u0440\u0441\u0443\u0445\u0456\u0455\u0458" + // Cyrillic lower
      "\u03bf\u03bd" + // Greek omicron, nu
      "\u0410\u0412\u0415\u041a\u041c\u041d\u041e\u0420\u0421\u0422\u0425" // Cyrillic upper
  val skeletonTo: String = "aeopcyxisj" + "ov" + "ABEKMHOPCTX"

  /** Mixed-script homoglyph spoof scan (UTS #39's restriction-level
    * idea as a corpus operator) — the phishing/SEO-spam signature
    * script totals miss: "p[Cyrillic а]ypal" is 86% Latin and looks
    * clean to [[scriptProfile]], but no legitimate word mixes Latin
    * and Cyrillic INSIDE one token. Per doc: token count, tokens
    * mixing ≥2 of {Latin, Cyrillic, Greek}, the first such token
    * (min — deterministic evidence), confusable-char count, whether
    * the skeleton fold ([[skeletonFrom]]→[[skeletonTo]] `translate`)
    * changes the text, and the spoof flag.
    *
    * Shape: whitespace tokens via `regexp_extract_all` (identical in
    * Java regex and RE2), ONE explode + doc-keyed aggregate (the
    * codegen-friendly path — no per-token lambda), scan-side
    * `regexp_count`/`translate` for the char-level columns; the text
    * never shuffles, only tokens do. */
  def spoofScan(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val scripts = Seq("[A-Za-z]", "[\\x{0400}-\\x{04FF}]",
      "[\\x{0370}-\\x{03FF}]")
    val tok = docs.select(col(idCol),
        explode_outer(regexp_extract_all(col(textCol), lit("[^ ]+"), lit(0)))
          .as("__tok"))
      .withColumn("__mixed",
        scripts.map(p => when(col("__tok").rlike(p), 1).otherwise(0))
          .reduce(_ + _) >= 2)
    val perDoc = tok.groupBy(col(idCol)).agg(
      count(col("__tok")).as("n_tokens"),
      count(when(col("__mixed"), 1)).as("n_mixed_tokens"),
      min(when(col("__mixed"), col("__tok"))).as("first_mixed_token"))
    docs.select(col(idCol),
        regexp_count(col(textCol), lit(s"[$skeletonFrom]")).cast("long")
          .as("n_confusable_chars"),
        (translate(col(textCol), skeletonFrom, skeletonTo) =!= col(textCol))
          .as("skeleton_changed"))
      .join(perDoc, idCol)
      .select(col(idCol), col("n_tokens"), col("n_mixed_tokens"),
        col("first_mixed_token"), col("n_confusable_chars"),
        col("skeleton_changed"),
        (col("n_mixed_tokens") > 0).as("spoof"))
  }

  /** Per-doc script profile: one `n_<family>` count per family,
    * `n_scripted` (their sum), `dominant`, and `dom_permille`
    * (dominant count ×1000 / n_scripted, NULL when no counted
    * letters at all). */
  def scriptProfile(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val counted = docs.select(
      (col(idCol) +: families.map { case (name, pat) =>
        regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$name")
      }): _*)
    val total = families.map(f => col(s"n_${f._1}")).reduce(_ + _)
    // fixed-order dominance: first family with count >= all later ones
    val dominant = families.map(_._1).reverse
      .foldLeft(lit("none")) { case (acc, name) =>
        val c = col(s"n_$name")
        val beatsLater = families.map(_._1).dropWhile(_ != name).tail
          .map(later => c >= col(s"n_$later"))
          .foldLeft(c > 0)(_ && _)
        when(beatsLater, lit(name)).otherwise(acc)
      }
    counted
      .withColumn("n_scripted", total)
      .withColumn("dominant", dominant)
      .withColumn("__dom_cnt", families.map { case (name, _) =>
        when(col("dominant") === name, col(s"n_$name"))
      }.reduce(coalesce(_, _)))
      // `div`, not `/`: exact integer permille on both engines (the
      // double-division floor can round differently at boundaries)
      .withColumn("dom_permille",
        when(col("dominant") =!= "none",
          expr("(__dom_cnt * 1000) div n_scripted")))
      .drop("__dom_cnt")
  }
}
