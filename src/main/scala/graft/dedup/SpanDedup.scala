package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact shared-SPAN detection between document pairs — the verbatim
  * half of corpus dedup (Lee et al. 2022, *Deduplicating Training Data
  * Makes Language Models Better*): a 40-token boilerplate paragraph
  * pasted into thousands of pages is invisible to whole-document
  * near-dup (Jaccard over the full shingle set stays tiny) but is
  * exactly the memorization vector substring dedup exists to remove.
  *
  * The paper's suffix-array construction assumes one big machine; this
  * is the distributed re-expression as k-gram DIAGONAL RUNS:
  *
  *  1. tokenize (whitespace; positions kept);
  *  2. every k-token window becomes a posting (md5(gram), doc, pos) —
  *     md5 shortens the shuffle key, both engines hash the same string;
  *  3. document-frequency cap `maxDf` drops ubiquitous grams — the
  *     same Σ df² candidate-volume governor as the q19 Jaccard join
  *     (a gram in half the corpus is chrome, not signal, and its
  *     pairs would dominate the join);
  *  4. postings self-join on the gram key (equi-join, never
  *     all-pairs); a matched pair at positions (pa, pb) lies on
  *     diagonal pa − pb — CONSECUTIVE gram positions on one diagonal
  *     are one contiguous shared substring;
  *  5. longest run per diagonal via the classic gaps-and-islands
  *     rewrite (pa − row_number() over the diagonal = island id) —
  *     one window + one aggregation, no iteration; a run of r grams
  *     is a shared span of r + k − 1 tokens.
  *
  * Shuffle budget: one partial agg (gram df), one equi-join keyed on
  * the gram hash, one window+agg keyed on (doc_a, doc_b, diagonal) —
  * all bounded by the df-capped posting volume, the documented scale
  * governor. Exact output (BIGINT token counts), partitioning-proof,
  * DuckDB-oracle-able — unlike the suffix array it replaces at
  * cluster scale.
  */
object SpanDedup {

  /** Pairs of documents sharing a verbatim token span of at least
    * `minSpanTokens`, with the longest such span and the matched-gram
    * count. `df` needs (`idCol`, `textCol`). */
  def sharedSpans(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  k: Int = 5, minSpanTokens: Int = 8,
                  maxDf: Int = 64): DataFrame = {
    require(k >= 2, "k-gram width must be >= 2")
    require(minSpanTokens >= k, "a detectable span is at least one gram")
    val toks = df.select(col(idCol).as("doc_id"),
        split(col(textCol), "\\s+").as("toks"))
      .where(size(col("toks")) >= k)
    // posting per k-token window; slice is 1-based
    val postings = toks.select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(toks) - $k), " +
            s"i -> struct(i AS pos, md5(array_join(slice(toks, i + 1, $k), ' ')) AS g))"))
          .as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.g").as("g"))
    val kept = postings.join(
      postings.groupBy("g").agg(countDistinct(col("doc_id")).as("__df"))
        .where(col("__df") <= maxDf)
        .select("g"),
      "g")
    val pairs = kept.select(col("g"), col("doc_id").as("doc_a"), col("pos").as("pa"))
      .join(kept.select(col("g"), col("doc_id").as("doc_b"), col("pos").as("pb")), "g")
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), (col("pa") - col("pb")).as("diag"))
      .distinct() // duplicate grams inside a doc can re-derive the same (pa, diag)
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    val runs = pairs
      .withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg((max(col("run")) + lit(k - 1)).as("max_span_tokens"),
        sum(col("run")).as("n_shared_grams"))
      .where(col("max_span_tokens") >= minSpanTokens)
  }
}
