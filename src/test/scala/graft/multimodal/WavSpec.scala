package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** [[Wav]] encoder ⊗ [[graft.functions.WavPcmUtil]] decoder, pinned
  * against hand-computed sample arithmetic (never against each other):
  * canonical mono/stereo round-trips, the RIFF pad-byte walk over
  * odd-length ancillary chunks, every decline path, and the
  * interpreted ≡ codegen contract of the native expression. */
class WavSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false)))

  private def media(rows: (Long, Array[Byte])*) =
    df(schema, rows.map { case (i, b) => Row(i, b) }: _*)

  private def wavStats(blobs: (Long, Array[Byte])*) =
    media(blobs: _*)
      .select(col("id"), Multimodal.wavPcmStats(col("media")).as("s"))
      .select(col("id"), col("s.decoded"), col("s.channels"),
        col("s.sample_rate"), col("s.n_frames"), col("s.sum_all"),
        col("s.sum_abs"), col("s.min_s"), col("s.max_s"),
        col("s.zero_cross0"))
      .orderBy("id")

  test("decodes a hand-computed mono WAV: sums, extremes, zero crossings") {
    // samples: 100, -200, 300, 0, -1  (channel 0 == the only channel)
    // sign flips (strict v<0 change): 100→-200, -200→300, 0→-1  = 3
    val s = Array(100, -200, 300, 0, -1)
    val wav = Wav.encodePcm16(1, 8000, 5, (f, _) => s(f))
    val out = wavStats(1L -> wav).collect().head
    out.getBoolean(1) shouldBe true
    out.getLong(2) shouldBe 1L         // channels
    out.getLong(3) shouldBe 8000L      // sample_rate
    out.getLong(4) shouldBe 5L         // n_frames
    out.getLong(5) shouldBe (100L - 200 + 300 + 0 - 1)
    out.getLong(6) shouldBe (100L + 200 + 300 + 0 + 1)
    out.getLong(7) shouldBe -200L
    out.getLong(8) shouldBe 300L
    out.getLong(9) shouldBe 3L
  }

  test("stereo: stats over all samples, zero crossings over channel 0 only") {
    // frames (ch0, ch1): (10, -10), (-20, 5), (30, -40)
    // all samples: 10 -10 -20 5 30 -40 → sum -25, |·| 115, min -40, max 30
    // ch0: 10 → -20 → 30 = 2 flips; ch1 flips (3) must NOT count
    val s = Array(Array(10, -10), Array(-20, 5), Array(30, -40))
    val wav = Wav.encodePcm16(2, 16000, 3, (f, c) => s(f)(c))
    val out = wavStats(1L -> wav).collect().head
    out.getBoolean(1) shouldBe true
    out.getLong(2) shouldBe 2L
    out.getLong(4) shouldBe 3L
    out.getLong(5) shouldBe -25L
    out.getLong(6) shouldBe 115L
    (out.getLong(7), out.getLong(8)) shouldBe ((-40L, 30L))
    out.getLong(9) shouldBe 2L
  }

  test("int16 boundaries survive the LE round-trip") {
    val s = Array(Short.MinValue.toInt, Short.MaxValue.toInt, -1, 1)
    val wav = Wav.encodePcm16(1, 44100, 4, (f, _) => s(f))
    val out = wavStats(1L -> wav).collect().head
    (out.getLong(7), out.getLong(8)) shouldBe
      ((Short.MinValue.toLong, Short.MaxValue.toLong))
    out.getLong(5) shouldBe (Short.MinValue + Short.MaxValue + 0L)
  }

  test("odd-length ancillary chunks are skipped via the RIFF pad byte") {
    val plain = Wav.encodePcm16(1, 8000, 3, (f, _) => f * 100 - 100)
    val padded = Wav.encodePcm16(1, 8000, 3, (f, _) => f * 100 - 100,
      ancillary = Seq("LIST" -> Array[Byte](1, 2, 3), // odd → pad byte
        "fact" -> Array[Byte](4, 5, 6, 7)))
    padded.length should be > plain.length
    val out = wavStats(1L -> plain, 2L -> padded).collect()
    out(0).toSeq.drop(1) shouldBe out(1).toSeq.drop(1) // identical stats
  }

  test("empty data chunk: decoded with zero frames and NULL extremes") {
    val wav = Wav.encodePcm16(2, 8000, 0, (_, _) => 0)
    val out = wavStats(1L -> wav).collect().head
    out.getBoolean(1) shouldBe true
    out.getLong(4) shouldBe 0L
    out.getLong(5) shouldBe 0L
    out.isNullAt(7) shouldBe true
    out.isNullAt(8) shouldBe true
    out.getLong(9) shouldBe 0L
  }

  test("declines non-canonical or corrupt blobs, never errors") {
    val good = Wav.encodePcm16(1, 8000, 4, (f, _) => f)
    val truncated = good.take(good.length - 3)   // data chunk short-read
    val notWav = Array.tabulate[Byte](64)(i => (i * 31).toByte)
    // bits-per-sample patched to 8 (offset: RIFF(12) + "fmt "+len(8) + 14)
    val bits8 = good.clone(); bits8(34) = 8
    // audio format patched to 3 (IEEE float)
    val float32 = good.clone(); float32(20) = 3
    // block align inconsistent with channel count
    val badAlign = good.clone(); badAlign(32) = 5
    // data before fmt: rebuild by hand swapping chunk order
    val dataFirst = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array[Byte](12, 0, 0, 0)) // size (irrelevant to walk)
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("data".getBytes("US-ASCII"))
      out.write(Array[Byte](2, 0, 0, 0)); out.write(Array[Byte](1, 0))
      out.toByteArray
    }
    val out = wavStats(1L -> truncated, 2L -> notWav, 3L -> bits8,
      4L -> float32, 5L -> badAlign, 6L -> dataFirst, 7L -> good).collect()
    out.map(_.getBoolean(1)).toSeq shouldBe
      Seq(false, false, false, false, false, false, true)
    out.take(6).foreach(r => r.isNullAt(5) shouldBe true)
  }

  test("declines an adversarial sample-count claim above the ceiling") {
    // canonical header, data length field patched beyond MaxSamples —
    // the walk sees a truncated chunk and declines without allocating
    val good = Wav.encodePcm16(1, 8000, 4, (f, _) => f)
    val huge = good.clone()
    val dataLenOff = good.length - 8 - 4 // 4 frames × 2 bytes + len field
    huge(dataLenOff) = 0xff.toByte; huge(dataLenOff + 1) = 0xff.toByte
    huge(dataLenOff + 2) = 0xff.toByte; huge(dataLenOff + 3) = 0x7f
    wavStats(1L -> huge).collect().head.getBoolean(1) shouldBe false
  }

  test("frameFeatures: hand-computed mono frames; boundary flips don't count") {
    // samples: 100 -200 300 0 | -1 50 -50 25 | 7 -7   (frameSize 4)
    // the 0 → -1 flip straddles the frame-0/frame-1 boundary — must
    // NOT appear in either frame's count
    val s = Array(100, -200, 300, 0, -1, 50, -50, 25, 7, -7)
    val wav = Wav.encodePcm16(1, 8000, 10, (f, _) => s(f))
    val out = media(1L -> wav)
      .select(explode(Multimodal.wavFrameFeatures(col("media"), 4)).as("f"))
      .select(col("f.frame_idx"), col("f.n"), col("f.energy"),
        col("f.zero_crossings"), col("f.peak"))
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (0, 4L, 140000L, 2L, 300L),
      (1, 4L, 5626L, 3L, 50L),
      (2, 2L, 98L, 1L, 7L))
  }

  test("frameFeatures: stereo uses channel 0 only; last partial frame kept") {
    val s = Array(Array(10, -10), Array(-20, 5), Array(30, -40))
    val wav = Wav.encodePcm16(2, 16000, 3, (f, c) => s(f)(c))
    val out = media(1L -> wav)
      .select(explode(Multimodal.wavFrameFeatures(col("media"), 2)).as("f"))
      .select(col("f.frame_idx"), col("f.n"), col("f.energy"),
        col("f.zero_crossings"), col("f.peak"))
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (0, 2L, 500L, 1L, 20L),   // ch0: 10, -20 (ch1 ignored)
      (1, 1L, 900L, 0L, 30L))
  }

  test("frameFeatures: declines garbage and bad frame size; empty data = empty array") {
    val good = Wav.encodePcm16(1, 8000, 0, (_, _) => 0)
    val rows = media(
      1L -> "not a wav at all".getBytes("US-ASCII"),
      2L -> good)
      .select(col("id"),
        Multimodal.wavFrameFeatures(col("media"), 4).as("f"),
        Multimodal.wavFrameFeatures(col("media"), 0).as("bad"))
      .orderBy("id").collect()
    rows(0).isNullAt(1) shouldBe true          // garbage -> null
    rows(1).getSeq[Row](1) shouldBe Seq.empty  // empty data -> []
    rows(0).isNullAt(2) shouldBe true          // frameSize < 1 -> null
    rows(1).isNullAt(2) shouldBe true
  }

  test("frameFeatures: interpreted and codegen paths agree") {
    val d = media((1L to 12L).map { i =>
      val ch = (1 + i % 2).toInt
      i -> Wav.encodePcm16(ch, 8000, (20 + i % 7).toInt,
        (f, c) => ((i * 7919 + (f * ch + c) * 104729) % 65536 - 32768).toInt)
    }: _*)
    def run(): Seq[(Long, Int, Long, Long)] = d
      .select(col("id"),
        explode(Multimodal.wavFrameFeatures(col("media"), 8)).as("f"))
      .select(col("id"), col("f.frame_idx"), col("f.energy"),
        col("f.zero_crossings"))
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
  }

  test("interpreted and codegen paths agree, and match direct eval") {
    val d = media((1L to 20L).map { i =>
      val ch = (1 + i % 3).toInt
      i -> Wav.encodePcm16(ch, 8000, (10 + i % 7).toInt,
        (f, c) => ((i * 7919 + (f * ch + c) * 104729) % 65536 - 32768).toInt,
        ancillary = if (i % 2 == 0) Seq("LIST" -> Array[Byte](9)) else Nil)
    }: _*)
    def run(): Seq[(Long, Long, Long, Long)] = d
      .select(col("id"), Multimodal.wavPcmStats(col("media")).as("s"))
      .select(col("id"), col("s.sum_all"), col("s.sum_abs"),
        col("s.zero_cross0"))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    val direct = d.select(col("id"), col("media")).collect().map { r =>
      val s = graft.functions.WavPcmUtil.stats(r.getAs[Array[Byte]](1))
      (r.getLong(0), s.getLong(4), s.getLong(5), s.getLong(8))
    }.toSeq.sortBy(_._1)
    codegen shouldBe direct
  }
}
