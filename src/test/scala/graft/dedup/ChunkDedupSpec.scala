package graft.dedup

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def docs(rows: (Long, String)*) =
    df(docsSchema, rows.map { case (i, t) => Row(i, t) }: _*)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("chunks cuts token streams into k-token pieces with a short tail") {
    val d = docs(1L -> "a b c d e f g")
    val out = ChunkDedup.chunks(d, k = 3)
      .select("ci", "chunk_text", "chunk_tokens")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    out shouldBe Array((0, "a b c", 3L), (1, "d e f", 3L), (2, "g", 1L))
  }

  test("sharedChunkProfile flags cross-doc chunks and keeps first instances") {
    // k=3: doc 1 = [a b c][d e f]; doc 2 = [a b c][x y z]; doc 3 unique.
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c x y z",
      3L -> "p q r s")
    val out = ChunkDedup.sharedChunkProfile(d, k = 3)
      .select("doc_id", "n_chunks", "n_shared_chunks", "n_kept_tokens", "kept_md5")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 2L, 1L, 6L, md5hex("a b c d e f")))
    // doc 2 loses [a b c] (doc 1 owns it) but is still flagged shared
    out(1) shouldBe ((2L, 2L, 1L, 3L, md5hex("x y z")))
    out(2) shouldBe ((3L, 2L, 0L, 4L, md5hex("p q r s")))
  }

  test("a fully duplicated document keeps nothing and hashes empty text") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f")
    val out = ChunkDedup.sharedChunkProfile(d, k = 3)
      .select("doc_id", "n_kept_tokens", "kept_md5", "shared_ratio")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 6L, md5hex("a b c d e f"), 1.0))
    out(1) shouldBe ((2L, 0L, md5hex(""), 1.0))
  }

  test("within-document repetition is not counted as shared") {
    val d = docs(1L -> "a b c a b c", 2L -> "x y z w")
    val out = ChunkDedup.sharedChunkProfile(d, k = 3)
      .select("doc_id", "n_shared_chunks", "n_kept_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 1's two [a b c] instances collide only with each other:
    // not shared (same doc), and the second instance is still dropped.
    out(0) shouldBe ((1L, 0L, 3L))
    out(1) shouldBe ((2L, 0L, 4L))
  }
}
