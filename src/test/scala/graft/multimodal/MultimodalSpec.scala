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

  private def pngStats(blobs: (Long, Array[Byte])*) =
    media(blobs: _*)
      .select(col("id"), Multimodal.pngPixelStats(col("media")).as("s"))
      .select(col("id"), col("s.decoded"), col("s.width"), col("s.height"),
        col("s.sum_r"), col("s.sum_g"), col("s.sum_b"),
        col("s.sum_luma1000"), col("s.dominant"))
      .orderBy("id")

  test("pngPixelStats decodes a hand-computed 2x2 image under every filter type") {
    // pixels: (0,0)=(10,20,30) (1,0)=(40,50,60) (0,1)=(70,80,90) (1,1)=(200,10,0)
    val px = Map((0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60),
      (0, 1) -> (70, 80, 90), (1, 1) -> (200, 10, 0))
    val sumR = 10 + 40 + 70 + 200; val sumG = 20 + 50 + 80 + 10
    val sumB = 30 + 60 + 90 + 0
    val luma = 299L * sumR + 587L * sumG + 114L * sumB
    // the same image encoded with each filter type on every row must
    // decode identically — pinning all five unfilter paths one by one
    for (ft <- 0 to 4) {
      val png = Png.encodeRgb(2, 2, (x, y) => px((x, y)), filterForRow = _ => ft)
      val out = pngStats(1L -> png).collect().head
      withClue(s"filter $ft: ") {
        out.getBoolean(1) shouldBe true
        (out.getLong(2), out.getLong(3)) shouldBe ((2L, 2L))
        (out.getLong(4), out.getLong(5), out.getLong(6)) shouldBe
          ((sumR.toLong, sumG.toLong, sumB.toLong))
        out.getLong(7) shouldBe luma
        out.getString(8) shouldBe "r"
      }
    }
  }

  test("pngPixelStats handles multi-IDAT streams and mixed filters") {
    val png = Png.encodeRgb(7, 11,
      (x, y) => ((x * 37 + y) % 256, (y * 53 + x) % 256, (x * y) % 256),
      filterForRow = _ % 5, idatChunkSize = 16) // many tiny IDAT chunks
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until 11; x <- 0 until 7) {
      sr += (x * 37 + y) % 256; sg += (y * 53 + x) % 256; sb += (x * y) % 256
    }
    val out = pngStats(1L -> png).collect().head
    out.getBoolean(1) shouldBe true
    (out.getLong(4), out.getLong(5), out.getLong(6)) shouldBe ((sr, sg, sb))
  }

  test("pngPixelStats declines unsupported or corrupt blobs, never errors") {
    val good = Png.encodeRgb(3, 3, (x, y) => (x, y, x + y))
    val truncated = good.take(good.length - 20)  // IEND + IDAT tail gone
    val corruptZlib = good.clone()
    corruptZlib(50) = (corruptZlib(50) ^ 0x55).toByte // flip inside IDAT
    val notPng = bytes600
    // oversized IHDR claim: flip width to 2^25 (over the pixel ceiling)
    val huge = good.clone()
    huge(16) = 0x02; huge(17) = 0x00; huge(18) = 0x00; huge(19) = 0x00
    val out = pngStats(1L -> truncated, 2L -> corruptZlib, 3L -> notPng,
        4L -> huge, 5L -> good)
      .collect()
    out.map(_.getBoolean(1)).toSeq shouldBe Seq(false, false, false, false, true)
    out.take(4).foreach(r => r.isNullAt(4) shouldBe true)
  }

  test("pngPixelStats: interpreted and codegen paths agree") {
    val d = media((1L to 20L).map(i =>
      i -> Png.encodeRgb((1 + i % 5).toInt, (1 + i % 4).toInt,
        (x, y) => (((i * 7 + x) % 256).toInt, ((i * 11 + y) % 256).toInt,
          ((x + y) % 256).toInt),
        filterForRow = y => ((y + i) % 5).toInt)): _*)
    def run(): Seq[(Long, Long, Long, Long)] = d
      .select(col("id"), Multimodal.pngPixelStats(col("media")).as("s"))
      .select(col("id"), col("s.sum_r"), col("s.sum_g"), col("s.sum_b"))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    // and both agree with a direct driver-side eval of the shared util
    val direct = d.select(col("id"), col("media")).collect().map { r =>
      val s = graft.functions.PngPixelUtil.stats(r.getAs[Array[Byte]](1))
      (r.getLong(0), s.getLong(4), s.getLong(5), s.getLong(6))
    }.toSeq.sortBy(_._1)
    codegen shouldBe direct
  }

  test("pngDhash: hand-computed 9x8 gradient — one pixel per cell") {
    // gray value decreasing in x: every left cell mean > right -> all
    // 64 bits set -> hash is the all-ones Long (-1); increasing -> 0.
    val dec = Png.encodeRgb(9, 8, (x, _) => (90 - x * 10, 90 - x * 10, 90 - x * 10))
    val inc = Png.encodeRgb(9, 8, (x, _) => (x * 10, x * 10, x * 10))
    val out = media(1L -> dec, 2L -> inc)
      .select(col("id"), Multimodal.pngDhash(col("media")).as("d"))
      .select(col("id"), col("d.decoded"), col("d.dhash"))
      .orderBy("id").as[(Long, Boolean, Long)].collect().toSeq
    out shouldBe Seq((1L, true, -1L), (2L, true, 0L))
  }

  test("pngDhash declines images narrower/shorter than the grid and non-PNGs") {
    val narrow = Png.encodeRgb(8, 8, (x, y) => (x, y, x + y)) // w < 9
    val short = Png.encodeRgb(9, 7, (x, y) => (x, y, x + y))  // h < 8
    val ok = Png.encodeRgb(9, 8, (x, y) => (x, y, x + y))
    val out = media(1L -> narrow, 2L -> short, 3L -> bytes600, 4L -> ok)
      .select(col("id"), Multimodal.pngDhash(col("media")).as("d"))
      .select(col("id"), col("d.decoded"), col("d.dhash"))
      .orderBy("id").as[(Long, Boolean, Option[Long])].collect().toSeq
    out.map(r => (r._1, r._2)) shouldBe
      Seq((1L, false), (2L, false), (3L, false), (4L, true))
    out.filter(!_._2).foreach(_._3 shouldBe None)
  }

  test("pngDhash is brightness-edit tolerant where content hashing is blind") {
    // 36x32: cells are 4x4 px. A one-pixel +1 edit changes the encoded
    // bytes (and thus any content hash) but no cell mean by enough to
    // flip a comparison against a slope-10 gradient.
    def grad(bump: Int) = Png.encodeRgb(36, 32, (x, y) =>
      { val v = (350 - x * 10 + y) % 256
        (if (x == 0 && y == 0) (v + bump) % 256 else v, v, v) })
    val a = grad(0); val b = grad(1)
    a.toSeq should not equal b.toSeq // byte-level dedup sees two blobs
    val hashes = media(1L -> a, 2L -> b)
      .select(Multimodal.pngDhash(col("media")).getField("dhash"))
      .as[Long].collect()
    java.lang.Long.bitCount(hashes(0) ^ hashes(1)) should be <= 2
  }

  test("imageNearDups: banded pairs match, inverted gradient excluded, undecodable dropped") {
    def gray(f: (Int, Int) => Int) =
      Png.encodeRgb(36, 32, (x, y) => { val v = f(x, y); (v, v, v) })
    val base = gray((x, y) => (350 - x * 10 + y) % 256)
    val nearA = gray((x, y) =>
      { val v = (350 - x * 10 + y) % 256; if (x == 0 && y == 0) (v + 1) % 256 else v })
    val inverted = gray((x, y) => (x * 10 + y) % 256)
    val tiny = Png.encodeRgb(4, 4, (x, y) => (x, y, 0)) // undecodable for dhash
    val pairs = Multimodal.imageNearDups(
        media(1L -> base, 2L -> base, 3L -> nearA, 4L -> inverted, 5L -> tiny),
        idCol = "id", binCol = "media", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    pairs.map(p => (p._1, p._2)) shouldBe Seq((1L, 2L), (1L, 3L), (2L, 3L))
    pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 shouldBe 0L
    pairs.foreach(_._3 should be <= 3L)
  }

  test("pngDhash: interpreted and codegen paths agree") {
    val d = media((1L to 15L).map(i =>
      i -> Png.encodeRgb((9 + i % 4).toInt, (8 + i % 3).toInt,
        (x, y) => (((i * 7 + x * 13) % 256).toInt, ((i * 11 + y * 3) % 256).toInt,
          ((x * y + i) % 256).toInt),
        filterForRow = y => ((y + i) % 5).toInt)): _*)
    def run(): Seq[(Long, Long)] = d
      .select(col("id"), Multimodal.pngDhash(col("media")).getField("dhash").as("h"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    val direct = d.select(col("id"), col("media")).collect().map { r =>
      val s = graft.functions.PngPixelUtil.dhash(r.getAs[Array[Byte]](1))
      (r.getLong(0), s.getLong(1))
    }.toSeq.sortBy(_._1)
    codegen shouldBe direct
  }

  test("wavFingerprint: hand-computed 65-sample ramp — one sample per segment") {
    // |amplitude| strictly decreasing -> every bit set -> all-ones
    // Long; strictly increasing -> 0. One sample per segment.
    val dec = Wav.encodePcm16(1, 8000, 65, (f, _) => 6500 - f * 100)
    val inc = Wav.encodePcm16(1, 8000, 65, (f, _) => f * 100)
    val short = Wav.encodePcm16(1, 8000, 64, (f, _) => f) // < 65 samples
    val out = media(1L -> dec, 2L -> inc, 3L -> short, 4L -> bytes600)
      .select(col("id"), Multimodal.wavFingerprint(col("media")).as("d"))
      .select(col("id"), col("d.decoded"), col("d.fingerprint"))
      .orderBy("id").as[(Long, Boolean, Option[Long])].collect().toSeq
    out shouldBe Seq((1L, true, Some(-1L)), (2L, true, Some(0L)),
      (3L, false, None), (4L, false, None))
  }

  test("wavFingerprint is gain-invariant and channel-0-scoped") {
    def clip(gain: Int, ch: Int) = Wav.encodePcm16(ch, 8000, 130,
      (f, c) => if (c == 0) ((f * f * 3 + 7 * f) % 201 - 100) * gain
                else (f * 13 + 5) % 199 - 99)
    val quiet = clip(1, 1); val loud = clip(3, 2) // 3x gain AND stereo junk
    quiet.toSeq should not equal loud.toSeq
    val fps = media(1L -> quiet, 2L -> loud)
      .select(Multimodal.wavFingerprint(col("media")).getField("fingerprint"))
      .as[Long].collect()
    fps(0) shouldBe fps(1)
  }

  test("audioNearDups: perturbed copy paired, distinct envelope excluded") {
    def clip(bump: Int, slope: Int) = Wav.encodePcm16(1, 8000, 130,
      (f, _) => (slope * f * f + 7 * f) % 201 - 100 + (if (f == 0) bump else 0))
    val pairs = Multimodal.audioNearDups(
        media(1L -> clip(0, 3), 2L -> clip(1, 3), 3L -> clip(0, 11)),
        idCol = "id", binCol = "media", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    pairs.map(p => (p._1, p._2)) shouldBe Seq((1L, 2L))
    pairs.head._3 should be <= 3L
  }

  test("bandedHammingPairs maxBucket governor: viral cluster chains linearly and still merges") {
    import spark.implicits._
    // 30 re-encodes of one asset (base hash, at most one bit flipped
    // per member -> pairwise Hamming <= 2) + 10 unrelated hashes.
    // With maxBucket = 8 every cluster bucket is oversized and
    // contributes its id-adjacent CHAIN; chain edges are true
    // near-dups so the cluster still merges whole.
    val base = 0x5a3c96e1d2b40f78L
    val rows = (0L until 30L).map(i => (i, base ^ (1L << ((i * 7) % 64).toInt))) ++
      (100L until 110L).map(i => (i, i * 0x9e3779b97f4a7c15L + 0x1234567L))
    val hashes = rows.toDF("doc_id", "h64")
    val governed = Multimodal.bandedHammingPairs(hashes, "doc_id",
      maxHamming = 3, maxBucket = 8)
    val ungoverned = Multimodal.bandedHammingPairs(hashes, "doc_id",
      maxHamming = 3, maxBucket = Long.MaxValue)
    val gp = governed.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val up = ungoverned.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    up.size should be >= 30 * 29 / 2 - 30 // near-all-pairs (some pairs at Hamming 2 may share only flooded bands)
    gp.size should be <= 4 * 30 // governed: <= (b-1) chain edges per band
    gp.subsetOf(up) shouldBe true // the governor never INVENTS a pair
    val labels = graft.dedup.Dedup.componentLabels(
        governed.select(col("doc_a"), col("doc_b")))
      .filter(col("node") < 100L).select("label").distinct().count()
    labels shouldBe 1L
    // chain selection is deterministic under input partitioning
    assertSameRows(governed,
      Multimodal.bandedHammingPairs(hashes.repartition(7), "doc_id",
        maxHamming = 3, maxBucket = 8))
  }

  test("bandedHammingPairs governor is dormant when every bucket fits the cap") {
    import spark.implicits._
    val hashes = (0L until 50L).map(i =>
      (i, i * 0x9e3779b97f4a7c15L + 0x77L)).toDF("doc_id", "h64")
    assertSameRows(
      Multimodal.bandedHammingPairs(hashes, "doc_id", maxHamming = 3),
      Multimodal.bandedHammingPairs(hashes, "doc_id", maxHamming = 3,
        maxBucket = Long.MaxValue))
  }

  test("wavFingerprint: interpreted and codegen paths agree") {
    val d = media((1L to 15L).map(i =>
      i -> Wav.encodePcm16((1 + i % 2).toInt, 8000, (70 + i * 7).toInt,
        (f, c) => (((i * 31 + f * f * (2 + i % 5) + c * 997) % 4001) - 2000).toInt)): _*)
    def run(): Seq[(Long, Boolean, Option[Long])] = d
      .select(col("id"), Multimodal.wavFingerprint(col("media")).as("s"))
      .select(col("id"), col("s.decoded"), col("s.fingerprint"))
      .orderBy("id").as[(Long, Boolean, Option[Long])].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    val direct = d.select(col("id"), col("media")).collect().map { r =>
      val s = graft.functions.WavPcmUtil.fingerprint(r.getAs[Array[Byte]](1))
      (r.getLong(0), s.getBoolean(0),
        if (s.isNullAt(1)) None else Some(s.getLong(1)))
    }.toSeq.sortBy(_._1)
    codegen shouldBe direct
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

  // --- JPEG header walk --------------------------------------------

  private def jpegRow(b: Array[Byte]) = media(1L -> b)
    .select(Multimodal.jpegMeta(col("media")).as("m"))

  private def jpegDecoded(b: Array[Byte]): Boolean =
    jpegRow(b).select("m.decoded").as[Boolean].head()

  test("jpegMeta parses a baseline JFIF: dims, components, segment roster") {
    val b = Jpeg.encodeHeader(w = 640, h = 480, components = 3,
      progressive = false, withJfif = true, nDqt = 2, commentLen = 5)
    val m = jpegRow(b).select("m.decoded", "m.progressive",
        "m.precision_bits", "m.width", "m.height", "m.n_pixels",
        "m.n_components", "m.n_segments", "m.has_jfif")
      .as[(Boolean, Boolean, Long, Long, Long, Long, Long, Long, Boolean)]
      .head()
    // segments: APP0 + COM + 2 DQT + SOF + DHT + SOS = 7
    m shouldBe ((true, false, 8L, 640L, 480L, 307200L, 3L, 7L, true))
  }

  test("jpegMeta: progressive grayscale without JFIF") {
    val b = Jpeg.encodeHeader(w = 31, h = 17, components = 1,
      progressive = true, withJfif = false, nDqt = 1, commentLen = 0)
    val m = jpegRow(b).select("m.decoded", "m.progressive",
        "m.n_components", "m.n_segments", "m.has_jfif")
      .as[(Boolean, Boolean, Long, Long, Boolean)].head()
    m shouldBe ((true, true, 1L, 4L, false)) // DQT + SOF + DHT + SOS
  }

  test("jpegMeta corruption cases all degrade to decoded=false, never throw") {
    val good = Jpeg.encodeHeader(w = 32, h = 16)
    val sofAt = { // locate the SOF0 marker for surgical corruption
      val i = good.indices.find(i =>
        (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
      i
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "not a jpeg" -> "plain text".getBytes("US-ASCII"),
      "signature only" -> good.take(2),
      "truncated mid-segment" -> good.take(sofAt + 4),
      "lost marker sync" -> { val b = good.clone(); b(sofAt) = 0x00; b },
      "EOI before SOF" -> (good.take(2) ++ Array(0xff.toByte, 0xd9.toByte)),
      "RST before SOS" ->
        (good.take(2) ++ Array(0xff.toByte, 0xd0.toByte) ++ good.drop(2)),
      "zero width" -> { val b = good.clone()
        b(sofAt + 7) = 0; b(sofAt + 8) = 0; b },
      "unsupported SOF (lossless C3)" -> { val b = good.clone()
        b(sofAt + 1) = 0xc3.toByte; b },
      "oversized dims (adversarial header)" -> { val b = good.clone()
        b(sofAt + 5) = 0xff.toByte; b(sofAt + 6) = 0xff.toByte
        b(sofAt + 7) = 0xff.toByte; b(sofAt + 8) = 0xff.toByte; b },
      "segment length overruns stream" -> { val b = good.clone()
        b(sofAt + 2) = 0x7f.toByte; b },
      "double SOF" -> { val sof = good.slice(sofAt, sofAt + 2 +
        (((good(sofAt + 2) & 0xff) << 8) | (good(sofAt + 3) & 0xff)))
        good.take(sofAt) ++ sof ++ good.drop(sofAt) })
    for ((name, b) <- cases)
      withClue(name) { jpegDecoded(b) shouldBe false }
    jpegDecoded(good) shouldBe true // the surgery baseline is valid
  }

  test("jpegMeta tolerates FF fill bytes before a marker (T.81 B.1.1.2)") {
    val good = Jpeg.encodeHeader(w = 20, h = 10)
    val padded = good.take(2) ++ Array.fill(3)(0xff.toByte) ++ good.drop(2)
    val m = jpegRow(padded).select("m.decoded", "m.width", "m.height")
      .as[(Boolean, Long, Long)].head()
    m shouldBe ((true, 20L, 10L))
  }

  test("jpegMeta: interpreted and codegen paths agree") {
    val d = media((1L to 20L).map(i =>
      i -> Jpeg.encodeHeader(w = (10 + i % 7).toInt, h = (5 + i % 5).toInt,
        components = if (i % 4 == 0) 1 else 3,
        progressive = i % 2 == 0, withJfif = i % 3 != 0,
        nDqt = (i % 3).toInt, commentLen = (i % 6).toInt)): _*)
    def run(): Seq[(Long, Long, Long, Long)] = d
      .select(col("id"), Multimodal.jpegMeta(col("media")).as("m"))
      .select(col("id"), col("m.width"), col("m.height"), col("m.n_segments"))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    val direct = d.select(col("id"), col("media")).collect().map { r =>
      val m = graft.functions.JpegHeaderUtil.meta(r.getAs[Array[Byte]](1))
      (r.getLong(0), m.getLong(3), m.getLong(4), m.getLong(7))
    }.toSeq.sortBy(_._1)
    codegen shouldBe direct
  }
test("silenceTrim: leading/trailing silence bounds, interior pause preserved") {
    // 5 frames of 4 samples: silent, loud, silent, loud, silent
    // energy(loud frame) = 4 * 1000^2 = 4,000,000; threshold 1,000,000
    val clip = Wav.encodePcm16(1, 8000, 20, (f, _) =>
      if ((f / 4) == 1 || (f / 4) == 3) 1000 else 0)
    val out = Multimodal.silenceTrim(media(1L -> clip), "id", "media",
        frameSize = 4, energyThreshold = 1000000L)
      .select("n_frames", "first_active", "last_active", "n_active",
        "keep_frames")
      .as[(Long, Option[Long], Option[Long], Long, Long)].head()
    out shouldBe ((5L, Some(1L), Some(3L), 2L, 3L))
  }

  test("silenceTrim: all-silent clip reports NULL bounds and keeps nothing") {
    val quiet = Wav.encodePcm16(1, 8000, 12, (_, _) => 3)
    val out = Multimodal.silenceTrim(media(7L -> quiet), "id", "media",
        frameSize = 4, energyThreshold = 1000L)
      .select("n_frames", "first_active", "last_active", "n_active",
        "keep_frames")
      .as[(Long, Option[Long], Option[Long], Long, Long)].head()
    out shouldBe ((3L, None, None, 0L, 0L))
  }

  test("silenceTrim: ragged last frame is a frame; fully-loud clip keeps all") {
    val loud = Wav.encodePcm16(1, 8000, 10, (_, _) => 2000) // 3 frames (4+4+2)
    val out = Multimodal.silenceTrim(media(2L -> loud), "id", "media",
        frameSize = 4, energyThreshold = 1000000L)
      .select("n_frames", "first_active", "last_active", "keep_frames")
      .as[(Long, Option[Long], Option[Long], Long)].head()
    out shouldBe ((3L, Some(0L), Some(2L), 3L))
  }

  private def gifRow(b: Array[Byte]) = media(1L -> b)
    .select(Multimodal.gifMeta(col("media")).as("m"))

  private def gifDecoded(b: Array[Byte]): Boolean =
    gifRow(b).select("m.decoded").as[Boolean].head()

  test("gifMeta parses an 89a with palette, two frames, one extension") {
    val b = Gif.encodeHeader(w = 320, h = 200, version89 = true,
      gctExp = 3, bgIndex = 5, nImages = 2, nExtensions = 1)
    val m = gifRow(b).select("m.decoded", "m.version89", "m.width",
        "m.height", "m.n_pixels", "m.gct_entries", "m.bg_index",
        "m.n_images", "m.n_extensions")
      .as[(Boolean, Boolean, Long, Long, Long, Long, Long, Long, Long)]
      .head()
    m shouldBe ((true, true, 320L, 200L, 64000L, 16L, 5L, 2L, 1L))
  }

  test("gifMeta: paletteless 87a single frame") {
    val b = Gif.encodeHeader(w = 7, h = 9, version89 = false,
      gctExp = -1, nImages = 1, nExtensions = 0)
    val m = gifRow(b).select("m.decoded", "m.version89",
        "m.gct_entries", "m.n_images")
      .as[(Boolean, Boolean, Long, Long)].head()
    m shouldBe ((true, false, 0L, 1L))
  }

  test("gifMeta corruption cases all degrade to decoded=false, never throw") {
    val good = Gif.encodeHeader(w = 32, h = 16, gctExp = 2)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "not a gif" -> "plain text padded out".getBytes("US-ASCII"),
      "unknown version (GIF90a)" -> { val b = good.clone()
        b(4) = '0'.toByte; b },
      "zero width" -> { val b = good.clone(); b(6) = 0; b(7) = 0; b },
      "oversized dims (adversarial header)" -> { val b = good.clone()
        b(6) = 0xff.toByte; b(7) = 0xff.toByte
        b(8) = 0xff.toByte; b(9) = 0xff.toByte; b },
      "GCT truncated" -> good.take(15),
      "missing trailer" -> good.dropRight(1),
      "imageless stream" -> Gif.encodeHeader(w = 8, h = 8, nImages = 0),
      "unknown block introducer" -> { val b = good.clone()
        // first block after the 8-entry GCT starts at 13 + 24
        b(37) = 0x7e.toByte; b },
      "sub-block length overruns stream" -> { val b = good.clone()
        b(b.length - 5) = 0x7f.toByte; b })
    for ((name, b) <- cases)
      withClue(name) { gifDecoded(b) shouldBe false }
    gifDecoded(good) shouldBe true // the surgery baseline is valid
  }

  test("gifMeta: interpreted and codegen paths agree") {
    val d = media((1L to 20L).map(i =>
      i -> Gif.encodeHeader(w = (10 + i % 7).toInt, h = (5 + i % 5).toInt,
        version89 = i % 2 == 0,
        gctExp = if (i % 3 == 0) -1 else (i % 8).toInt,
        bgIndex = (i % 5).toInt, nImages = (1 + i % 3).toInt,
        nExtensions = (i % 4).toInt)): _*)
    def run(): Seq[(Long, Long, Long, Long, Long)] = d
      .select(col("id"), Multimodal.gifMeta(col("media")).as("m"))
      .select(col("id"), col("m.width"), col("m.gct_entries"),
        col("m.n_images"), col("m.n_extensions"))
      .orderBy("id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
  }

  private def frameRows(b: Array[Byte]) = media(1L -> b)
    .select(explode(Multimodal.gifFrames(col("media"))).as("f"))
    .select("f.frame_index", "f.left", "f.top", "f.width", "f.height",
      "f.lct_entries", "f.delay_cs", "f.disposal")
    .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
    .collect().toSeq

  test("gifFrames: animation fixture fields match the index formulas, " +
    "incl. the GCE-less fifth frame's 0/0 spec default") {
    val rows = frameRows(Gif.encodeAnimation(w = 10, h = 6, nFrames = 7))
    rows.size shouldBe 7
    rows.zipWithIndex.foreach { case ((fi, l, t, w, h, lct, d, disp), i) =>
      withClue(s"frame $i: ") {
        fi shouldBe i.toLong
        l shouldBe 2L * i
        t shouldBe 3L * i
        w shouldBe 1L + i % 10
        h shouldBe 1L + i % 6
        lct shouldBe (if (i % 3 == 0) 1L << ((i % 7) + 1) else 0L)
        if (i % 5 == 4) { d shouldBe 0L; disp shouldBe 0L }
        else { d shouldBe 4L + 3L * i; disp shouldBe i % 4L }
      }
    }
  }

  test("gifFrames: 87a fixtures carry no GCEs — every frame reports 0/0") {
    val rows = frameRows(
      Gif.encodeAnimation(w = 8, h = 8, nFrames = 4, version89 = false))
    rows.size shouldBe 4
    rows.foreach { case (_, _, _, _, _, _, d, disp) =>
      d shouldBe 0L; disp shouldBe 0L
    }
  }

  test("gifFrames: malformed streams degrade to NULL, never throw") {
    val good = Gif.encodeAnimation(w = 6, h = 4, nFrames = 3)
    def isNullFor(b: Array[Byte]): Boolean = media(1L -> b)
      .select(Multimodal.gifFrames(col("media")).isNull.as("n"))
      .as[Boolean].head()
    val cases: Seq[(String, Array[Byte])] = Seq(
      "not a gif" -> "plain text padded out".getBytes("US-ASCII"),
      "trailer cut" -> good.dropRight(1),
      // GCE of frame 0 sits right after the 13-byte header; its
      // length byte (spec: 4) is at offset 15 — a wrong length is
      // lost sync, not a guess
      "GCE with non-spec length byte" -> { val b = good.clone()
        b(15) = 3.toByte; b },
      "imageless stream" -> Gif.encodeHeader(w = 8, h = 8, nImages = 0),
      "mid-frame truncation" -> good.take(20))
    for ((name, b) <- cases) withClue(name) { isNullFor(b) shouldBe true }
    isNullFor(good) shouldBe false // the surgery baseline is valid
  }

  test("pngThumbnail: stride sampling by hand — 9x5 at maxDim 3 picks (3tx, 3ty)") {
    // s = max(ceil(9/3), ceil(5/3)) = 3 -> 3x2 thumb sampling columns
    // {0,3,6} x rows {0,3}; sums hand-derivable from the formula
    def f(x: Int, y: Int): (Int, Int, Int) = (x * 10 + y, 2 * x + y, 7 * y + x)
    val b = Png.encodeRgb(9, 5, f, filterForRow = _ % 5)
    val m = media(1L -> b)
      .select(Multimodal.pngPixelStats(
        Multimodal.pngThumbnail(col("media"), maxDim = 3)).as("s"))
      .select("s.decoded", "s.width", "s.height", "s.n_pixels",
        "s.sum_r", "s.sum_g", "s.sum_b")
      .as[(Boolean, Long, Long, Long, Long, Long, Long)].head()
    val pts = for (tx <- Seq(0, 3, 6); ty <- Seq(0, 3)) yield f(tx, ty)
    m shouldBe ((true, 3L, 2L, 6L,
      pts.map(_._1.toLong).sum, pts.map(_._2.toLong).sum,
      pts.map(_._3.toLong).sum))
  }

  test("pngThumbnail: maxDim >= dims is the re-encode identity; malformed and bad dims are NULL") {
    val b = Png.encodeRgb(7, 4,
      (x, y) => (x * 17 % 256, y * 29 % 256, (x + y) % 256),
      filterForRow = _ % 5)
    val orig = media(1L -> b)
      .select(Multimodal.pngPixelStats(col("media")).as("s"))
      .select("s.width", "s.height", "s.sum_r", "s.sum_g", "s.sum_b")
      .as[(Long, Long, Long, Long, Long)].head()
    val thumbed = media(1L -> b)
      .select(Multimodal.pngPixelStats(
        Multimodal.pngThumbnail(col("media"), maxDim = 16)).as("s"))
      .select("s.width", "s.height", "s.sum_r", "s.sum_g", "s.sum_b")
      .as[(Long, Long, Long, Long, Long)].head()
    thumbed shouldBe orig
    def isNullFor(bytes: Array[Byte], maxDim: Int): Boolean =
      media(1L -> bytes)
        .select(Multimodal.pngThumbnail(col("media"), maxDim).isNull.as("n"))
        .as[Boolean].head()
    isNullFor("not a png".getBytes("US-ASCII"), 4) shouldBe true
    isNullFor(b.take(40), 4) shouldBe true // truncated mid-IDAT
    isNullFor(b, 0) shouldBe true          // nonsense target dim
  }

  test("wavDecimate: every-3rd-frame by hand — samples, divided rate, frame count") {
    // 2 channels, 7 frames, sample = frame*10 + channel: decimated
    // frames {0,3,6} -> samples 0,1,30,31,60,61; rate 9000 -> 3000
    val b = Wav.encodePcm16(2, 9000, 7, (f, c) => f * 10 + c)
    val m = media(1L -> b)
      .select(Multimodal.wavPcmStats(
        Multimodal.wavDecimate(col("media"), factor = 3)).as("s"))
      .select("s.decoded", "s.channels", "s.sample_rate", "s.n_frames",
        "s.sum_all", "s.min_s", "s.max_s")
      .as[(Boolean, Long, Long, Long, Long, Long, Long)].head()
    m shouldBe ((true, 2L, 3000L, 3L, 183L, 0L, 61L))
  }

  test("wavDecimate: factor 1 is the re-encode identity; degrade cases NULL") {
    val b = Wav.encodePcm16(1, 8000, 20,
      (f, _) => (f * 997 % 65536) - 32768,
      ancillary = Seq("LIST" -> Array[Byte](1, 2, 3)))
    def statsOf(c: org.apache.spark.sql.Column) = media(1L -> b)
      .select(Multimodal.wavPcmStats(c).as("s"))
      .select("s.n_frames", "s.sum_all", "s.sum_abs", "s.zero_cross0")
      .as[(Long, Long, Long, Long)].head()
    statsOf(Multimodal.wavDecimate(col("media"), 1)) shouldBe
      statsOf(col("media"))
    def isNullFor(bytes: Array[Byte], factor: Int): Boolean =
      media(1L -> bytes)
        .select(Multimodal.wavDecimate(col("media"), factor).isNull.as("n"))
        .as[Boolean].head()
    isNullFor("not a wav".getBytes("US-ASCII"), 3) shouldBe true
    isNullFor(b.take(30), 3) shouldBe true // truncated mid-chunk
    isNullFor(b, 0) shouldBe true          // nonsense factor
  }

  test("wavDecimate: factor above the sample rate clamps the header to 1 Hz (q341 twin mirrors)") {
    // 100 frames at 50 Hz, factor 200 > rate: 50 div 200 = 0 would be
    // a malformed header — the operator clamps to 1 Hz and keeps the
    // ceil(100/200) = 1 surviving frame; the q341 oracle's
    // greatest(1, rate // factor) mirrors exactly this.
    val b = Wav.encodePcm16(1, 50, 100, (f, _) => f * 3 - 50)
    val m = media(1L -> b)
      .select(Multimodal.wavPcmStats(
        Multimodal.wavDecimate(col("media"), factor = 200)).as("s"))
      .select("s.decoded", "s.sample_rate", "s.n_frames", "s.sum_all")
      .as[(Boolean, Long, Long, Long)].head()
    m shouldBe ((true, 1L, 1L, -50L)) // frame 0 only: 0*3 - 50
  }

  test("pngThumbnail: interpreted and codegen paths agree") {
    val d = media((1L to 10L).map(i =>
      i -> Png.encodeRgb((6 + i % 7).toInt, (5 + i % 5).toInt,
        (x, y) => ((x * i % 256).toInt, (y * 3 % 256).toInt, ((x + y + i) % 256).toInt),
        filterForRow = y => ((y + i) % 5).toInt)): _*)
    def run(): Seq[(Long, Long, Long)] = d
      .select(col("id"), Multimodal.pngPixelStats(
        Multimodal.pngThumbnail(col("media"), maxDim = 4)).as("s"))
      .select(col("id"), col("s.width"), col("s.sum_r"))
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
  }

  test("gifFrames: interpreted and codegen paths agree (incl. NULL rows)") {
    val d = media(((1L to 12L).map { i =>
      i -> Gif.encodeAnimation(w = (6 + i % 5).toInt, h = (4 + i % 3).toInt,
        nFrames = (1 + i % 4).toInt, version89 = i % 3 != 0)
    } :+ (99L -> "garbage".getBytes("US-ASCII"))): _*)
    def run(): Seq[(Long, Boolean, Long)] = d
      .select(col("id"), Multimodal.gifFrames(col("media")).as("f"))
      .select(col("id"), col("f").isNull.as("missing"),
        coalesce(org.apache.spark.sql.functions.size(col("f")), lit(-1))
          .cast("long").as("n"))
      .orderBy("id").as[(Long, Boolean, Long)].collect().toSeq
    val codegen = run()
    codegen.count(_._2) shouldBe 1 // exactly the garbage row is NULL
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
  }
}
