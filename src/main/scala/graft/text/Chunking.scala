package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking — splitting long documents into fixed-size
  * overlapping token windows, the prep step between cleaning and
  * sequence packing when documents exceed the model's context length
  * (every pretraining pipeline runs it; the overlap (`window - stride`
  * tokens) preserves cross-boundary context the hard cut would lose).
  *
  * Chunk starts are `0, stride, 2·stride, …` up to the LAST start that
  * still extends coverage: `stride · ⌈max(0, n − window) / stride⌉`.
  * The final chunk may be shorter than `window` but is never fully
  * contained in its predecessor (a naive `range(0, n, stride)` emits
  * redundant contained tails whenever `stride < window`), so chunk
  * count is exactly `1 + ⌈max(0, n − window) / stride⌉` for non-empty
  * docs and 0 for token-less docs. Pure integer arithmetic, shared
  * verbatim with the DuckDB oracle.
  *
  * Distributed shape: one projection computes the token array ONCE
  * (materialized behind its own select so no lambda re-tokenizes —
  * the measured HOF pitfall), `sequence` + `posexplode` generate the
  * per-chunk rows scan-side (no shuffle at all — chunking is
  * embarrassingly parallel), and `slice`/`concat_ws` are codegen'd
  * collection functions, not interpreted lambdas. Output grows by
  * ~window/stride ×, which is the operator's contract, not overhead. */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, start_token, n_tokens,
    * chunk_text). Tokens are maximal non-whitespace runs; `n_tokens`
    * is the chunk's own (possibly short) length. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (stride > window would skip tokens)")
    val toks = docs.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("toks"))
    val n = size(col("toks"))
    val lastStart = (floor((greatest(n - window, lit(0)) + stride - 1)
      / stride) * stride).cast("int")
    toks
      .filter(n > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), lastStart, lit(stride)))
          .as(Seq("chunk_idx", "start_token")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_token").cast("long").as("start_token"),
        slice(col("toks"), col("start_token") + 1, lit(window)).as("chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_token"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}
