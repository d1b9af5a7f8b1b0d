package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false)))

  // Non-ASCII bytes on purpose: the plumbing must be byte-clean, not
  // string-clean (real media is arbitrary bytes).
  private val bytes600: Array[Byte] =
    Array.tabulate(600)(i => ((i * 31 + 7) % 256 - 128).toByte)

  private def media(rows: (Long, Array[Byte])*) =
    df(schema, rows.map { case (i, b) => Row(i, b) }: _*)

  test("mediaMeta: byte length, 8-byte header hex, content md5") {
    val d = media(1L -> bytes600)
    val r = d.select(Multimodal.mediaMeta(col("media")).as("m"))
      .select("m.n_bytes", "m.header_hex", "m.content_md5")
      .as[(Long, String, String)].head()
    r._1 shouldBe 600L
    r._2 shouldBe bytes600.take(8).map(b => f"$b%02X").mkString
    val jm = java.security.MessageDigest.getInstance("MD5")
    r._3 shouldBe jm.digest(bytes600).map(b => f"$b%02x").mkString
  }

  test("chunk splits into fixed sizes with ragged tail and reassembles") {
    val d = media(1L -> bytes600)
    val chunks = d.select(Multimodal.chunk(col("media"), 256).as("c"))
      .as[Seq[Array[Byte]]].head()
    chunks.map(_.length) shouldBe Seq(256, 256, 88)
    chunks.flatten.toArray shouldBe bytes600
  }

  test("chunk of empty media is an empty array") {
    val d = media(1L -> Array.empty[Byte])
    d.select(Multimodal.chunk(col("media"), 256).as("c"))
      .as[Seq[Array[Byte]]].head() shouldBe Seq.empty
  }

  test("stubDecode is deterministic and in-range") {
    val d = media(1L -> bytes600, 2L -> bytes600)
    val out = d.select(Multimodal.stubDecode(col("media")).as("d"))
      .select("d.width", "d.height", "d.channels_idx")
      .as[(Long, Long, Int)].collect()
    out(0) shouldBe out(1) // same content -> same fake dimensions
    out(0)._1 should (be >= 1L and be <= 1920L)
    out(0)._2 should (be >= 1L and be <= 1080L)
    out(0)._3 should (be >= 0 and be <= 2)
  }

  test("frameSample decimates by stride, keeps the ragged tail, hashes bytes") {
    // 600 bytes / 128 = 5 frames (0..4); stride 2 samples 0, 2, 4
    val d = media(1L -> bytes600, 2L -> Array.empty[Byte])
    val out = Multimodal.frameSample(d, "id", "media", frameSize = 128, stride = 2)
      .orderBy("id", "frame_idx")
      .as[(Long, Long, String, Long)].collect()
    out.map(r => (r._1, r._2)).toSeq shouldBe Seq((1L, 0L), (1L, 2L), (1L, 4L))
    out.map(_._4).toSeq shouldBe Seq(128L, 128L, 88L) // ragged tail
    val jm = java.security.MessageDigest.getInstance("MD5")
    out(1)._3 shouldBe
      jm.digest(bytes600.slice(256, 384)).map(b => f"$b%02x").mkString
  }

  test("chunkHashes yields one md5 per chunk") {
    val d = media(1L -> bytes600)
    val hs = d.select(Multimodal.chunkHashes(col("media"), 256).as("h"))
      .as[Seq[String]].head()
    hs.length shouldBe 3
    val jm = java.security.MessageDigest.getInstance("MD5")
    hs.head shouldBe jm.digest(bytes600.take(256)).map(b => f"$b%02x").mkString
  }

  private def be(v: Long, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  private def le(v: Long, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((v >> (8 * i)) & 0xff).toByte)

  test("pngHeader parses a real IHDR; rejects non-PNG bytes") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      be(13, 4) ++ "IHDR".getBytes ++
      be(1920, 4) ++ be(1080, 4) ++ Array[Byte](8, 6) // depth 8, RGBA
    val out = media(1L -> png, 2L -> bytes600)
      .select(col("id"), Multimodal.pngHeader(col("media")).as("h"))
      .select("id", "h.is_png", "h.width", "h.height", "h.bit_depth", "h.color_type")
      .orderBy("id").collect()
    out(0).getBoolean(1) shouldBe true
    out(0).getLong(2) shouldBe 1920L
    out(0).getLong(3) shouldBe 1080L
    out(0).getLong(4) shouldBe 8L
    out(0).getLong(5) shouldBe 6L
    out(1).getBoolean(1) shouldBe false
    out(1).isNullAt(2) shouldBe true
  }

  test("pngHeader rejects a signature-only or non-IHDR-first blob") {
    val sigOnly = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    // right signature, wrong first chunk type (spec violation)
    val wrongChunk = sigOnly ++ be(13, 4) ++ "IDAT".getBytes ++
      be(1920, 4) ++ be(1080, 4) ++ Array[Byte](8, 6)
    // signature + IHDR magic but truncated before the field bytes
    val truncated = sigOnly ++ be(13, 4) ++ "IHDR".getBytes
    val out = media(1L -> sigOnly, 2L -> wrongChunk, 3L -> truncated)
      .select(col("id"), Multimodal.pngHeader(col("media")).as("h"))
      .select("id", "h.is_png", "h.width")
      .orderBy("id").collect()
    out.foreach { r =>
      r.getBoolean(1) shouldBe false
      r.isNullAt(2) shouldBe true
    }
  }

  test("wavHeader parses a canonical RIFF fmt chunk") {
    val wav = "RIFF".getBytes ++ le(36, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++      // PCM
      le(2, 2) ++ le(44100, 4) ++                      // stereo, 44.1k
      le(176400, 4) ++ le(4, 2) ++ le(16, 2)           // rates, 16-bit
    val out = media(1L -> wav)
      .select(Multimodal.wavHeader(col("media")).as("h"))
      .select("h.is_wav", "h.channels", "h.sample_rate", "h.bits_per_sample")
      .as[(Boolean, Long, Long, Long)].head()
    out shouldBe ((true, 2L, 44100L, 16L))
  }
}
