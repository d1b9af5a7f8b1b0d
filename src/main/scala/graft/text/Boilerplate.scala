package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document line-level boilerplate removal — the corpus-wide
  * cousin of the within-doc repetition score: lines that recur across
  * MANY documents (nav menus, cookie banners, footers, "subscribe"
  * calls) are template chrome, not content, and web-scale pipelines
  * strip them by document frequency (CCNet arXiv:1911.00359 dedupes
  * paragraph-hashes across shards; RefinedWeb arXiv:2306.01116 §3
  * line-wise filtering). Removing them BEFORE near-dup detection also
  * sharpens MinHash: boilerplate inflates cross-site similarity.
  *
  * Distributed shape (the part that must survive 100 TB):
  *  1. explode to (doc, line_idx, line) and key every shuffle by the
  *     16-byte md5 of the line — the full text of a line crosses the
  *     wire only inside its own document's row, never as a join key;
  *  2. document frequency = two-phase countDistinct over (line_md5),
  *     partial-aggregated map-side, so a line repeated within one doc
  *     contributes once and the reduce side sees hash-sized rows;
  *  3. the boilerplate SET (df ≥ minDocs) is tiny by construction —
  *     template lines are few — so the anti-join back onto the
  *     exploded lines is AQE-broadcastable; content lines never
  *     rendezvous;
  *  4. reassembly is one groupBy(doc) with an array_sort over
  *     (line_idx, line) structs — deterministic order, no window.
  *
  * md5 equality stands in for line equality (the exact-dedup
  * operator's documented contract: a 128-bit collision is below any
  * corpus's error floor). */
object Boilerplate {

  /** Strip lines appearing in ≥ `minDocs` distinct documents.
    * Returns one row per input document: `idCol`, `n_lines` (before),
    * `kept_lines`, `clean_text` (surviving lines joined by `sep`, ''
    * when everything was boilerplate — the row is kept so downstream
    * length/quality gates see the doc died to chrome, not to loss). */
  def removeCommonLines(df: DataFrame, idCol: String, textCol: String,
                        minDocs: Long, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), sepRe)))
      .toDF(idCol, "line_idx", "line")
      .withColumn("line_md5", md5(col("line")))
    val boiler = lines
      .groupBy(col("line_md5"))
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
    val kept = lines.join(boiler, Seq("line_md5"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("kept_lines"),
      concat_ws(sep, transform(
        array_sort(collect_list(struct(col("line_idx"), col("line")))),
        s => s.getField("line"))).as("clean_text"))
    df.select(col(idCol),
        size(split(col(textCol), sepRe)).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The flagged side, for auditing what a threshold would remove:
    * each boilerplate line with its document frequency. */
  def commonLines(df: DataFrame, idCol: String, textCol: String,
                  minDocs: Long, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val sepRe = java.util.regex.Pattern.quote(sep)
    df.select(col(idCol), explode(split(col(textCol), sepRe)).as("line"))
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
  }
}
