package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = Seq((id, text)).toDF("doc_id", "text")

  private def chunks(text: String, window: Int, stride: Int): Seq[(Long, Long, Long, String)] =
    Chunking.chunkTokens(doc(1L, text), "doc_id", "text", window, stride)
      .select("chunk_idx", "start_token", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("overlapping windows with a short final chunk") {
    // 7 tokens, window 4, stride 2: starts 0, 2, 4 — last chunk short (3)
    chunks("a b c d e f g", window = 4, stride = 2) shouldBe Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 4L, "c d e f"),
      (2L, 4L, 3L, "e f g"))
  }

  test("no redundant contained tail when the stride would overshoot") {
    // 5 tokens, window 4, stride 2: naive range(0,5,2) emits start 4,
    // whose chunk [e] is contained in [c d e] — the formula stops at 2.
    chunks("a b c d e", window = 4, stride = 2) shouldBe Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 3L, "c d e"))
  }

  test("doc shorter than the window is one whole chunk") {
    chunks("a b", window = 10, stride = 5) shouldBe Seq((0L, 0L, 2L, "a b"))
  }

  test("exact multiple leaves no short tail") {
    // 6 tokens, window 3, stride 3 (no overlap): two full chunks
    chunks("a b c d e f", window = 3, stride = 3) shouldBe Seq(
      (0L, 0L, 3L, "a b c"),
      (1L, 3L, 3L, "d e f"))
  }

  test("token-less docs produce zero chunks; mixed whitespace tokenizes") {
    Chunking.chunkTokens(doc(1L, "   \t \n "), "doc_id", "text", 4, 2)
      .count() shouldBe 0L
    chunks("  a\t b \n c ", window = 2, stride = 2) shouldBe Seq(
      (0L, 0L, 2L, "a b"),
      (1L, 2L, 1L, "c"))
  }

  test("stride > window is rejected (it would silently skip tokens)") {
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunkTokens(doc(1L, "a b"), "doc_id", "text", 2, 3)
  }
}
