package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

class Mp4Spec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  private def media(rows: (Long, Array[Byte])*) =
    df(schema, rows.map { case (i, b) => Row(i, b) }: _*)

  private def parse(b: Array[Byte]) = media(1L -> b)
    .select(Multimodal.mp4Header(col("media")).as("m"))
    .select("m.decoded", "m.major_brand", "m.mvhd_version", "m.timescale",
      "m.duration", "m.duration_ms", "m.n_tracks", "m.n_top_boxes",
      "m.has_mdat")
    .collect().head

  test("mp4Header: hand-built v0 header — every field from the construction") {
    val b = Mp4.encodeHeader("isom", timescale = 600, duration = 1501,
      nTracks = 2, mvhdV1 = false, freeBefore = true)
    val r = parse(b)
    r.getBoolean(0) shouldBe true
    r.getString(1) shouldBe "isom"
    r.getInt(2) shouldBe 0
    r.getLong(3) shouldBe 600L
    r.getLong(4) shouldBe 1501L
    r.getLong(5) shouldBe 2501L // 1501*1000/600 floor
    r.getLong(6) shouldBe 2L
    r.getLong(7) shouldBe 4L // ftyp free moov mdat
    r.getBoolean(8) shouldBe true
  }

  test("mp4Header: v1 (64-bit times), largesize mdat, and to-EOF mdat all parse") {
    val v1 = parse(Mp4.encodeHeader("mp42", 1000, 123456789L, 1,
      mvhdV1 = true, mdatLargesize = true))
    v1.getInt(2) shouldBe 1
    v1.getLong(4) shouldBe 123456789L
    v1.getLong(5) shouldBe 123456789L
    val eof = parse(Mp4.encodeHeader("avc1", 90000, 90000, 3,
      mdatToEof = true))
    eof.getBoolean(0) shouldBe true
    eof.getLong(6) shouldBe 3L
    eof.getBoolean(8) shouldBe true
  }

  test("mp4Header degrade contract: truncation, wrong first box, bad sizes, zero timescale") {
    def declined(b: Array[Byte]): Unit = {
      val r = parse(b)
      withClue(s"bytes len ${b.length}: ") { r.getBoolean(0) shouldBe false }
      r.isNullAt(1) shouldBe true
    }
    val good = Mp4.encodeHeader("isom", 600, 1200, 1)
    declined(good.take(20))               // truncated mid-ftyp
    declined(good.take(good.length - 3))  // truncated mid-mdat
    declined { val c = good.clone(); c(4) = 'x'.toByte; c } // not ftyp first
    declined { val c = good.clone(); c(3) = 120.toByte; c } // ftyp size overruns
    declined(Mp4.encodeHeader("isom", 0, 1200, 1))  // zero timescale
    declined(Array[Byte](1, 2, 3))        // too short
    declined("RIFF....WAVE".getBytes("US-ASCII") ++ new Array[Byte](20))
    // moov child overrunning its parent: ftyp is 24 bytes, moov header
    // at 24, mvhd child header at 32 — inflate a high byte of the mvhd
    // size so the child claims far more than the parent holds
    val c = Mp4.encodeHeader("isom", 600, 1200, 1)
    c(32 + 1) = 127.toByte
    declined(c)
  }

  test("mp4Tracks: one row per trak with tkhd fields, both versions; malformed -> NULL") {
    val v0 = Mp4.encodeHeader("isom", 600, 777, 3, mvhdV1 = false)
    val rows = media(1L -> v0)
      .select(explode(Multimodal.mp4Tracks(col("media"))).as("t"))
      .select("t.track_index", "t.track_id", "t.tkhd_version",
        "t.duration", "t.width_px", "t.height_px")
      .orderBy("t.track_index")
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSeq
    rows shouldBe Seq(
      (0L, 1L, 0, 777L, 320L, 240L),
      (1L, 2L, 0, 777L, 336L, 248L),
      (2L, 3L, 0, 777L, 352L, 256L))
    val v1 = Mp4.encodeHeader("mp42", 1000, 5000, 1, mvhdV1 = true)
    media(1L -> v1)
      .select(explode(Multimodal.mp4Tracks(col("media"))).as("t"))
      .select("t.tkhd_version", "t.duration")
      .as[(Int, Long)].head() shouldBe ((1, 5000L))
    // malformed: whole array NULL (and the codegen path must not NPE)
    media(1L -> v0.take(20))
      .select(Multimodal.mp4Tracks(col("media")).isNull.as("n"))
      .as[Boolean].head() shouldBe true
    // zero tracks: empty array, not NULL
    media(1L -> Mp4.encodeHeader("isom", 600, 1, 0))
      .select(org.apache.spark.sql.functions.size(
        Multimodal.mp4Tracks(col("media"))).as("s"))
      .as[Int].head() shouldBe 0
  }

  test("mp4Samples: hand-built sample tables — dts cumsum, run deltas, sizes, sync flags") {
    val trak = Mp4.sampledTrak(7L, 5000L, 320L, 240L, v1 = false,
      mediaTimescale = 1000L, mediaDuration = 800L,
      runs = Seq((3L, 100L), (2L, 250L)), syncs = Some(Seq(1L, 4L)),
      uniformSize = 0L, sizes = Seq(10L, 20L, 30L, 40L, 50L))
    val b = Mp4.encodeMovie("isom", 600, 5000, Seq(trak))
    val rows = media(1L -> b)
      .select(explode(Multimodal.mp4Samples(col("media"))).as("s"))
      .select("s.track_id", "s.media_timescale", "s.sample_index",
        "s.dts", "s.delta", "s.size", "s.is_sync")
      .orderBy("s.sample_index")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    rows shouldBe Seq(
      (7L, 1000L, 1L, 0L, 100L, 10L, true),
      (7L, 1000L, 2L, 100L, 100L, 20L, false),
      (7L, 1000L, 3L, 200L, 100L, 30L, false),
      (7L, 1000L, 4L, 300L, 250L, 40L, true),
      (7L, 1000L, 5L, 550L, 250L, 50L, false))
    // keyframe sampling = a plain filter on the exploded rows
    media(1L -> b)
      .select(explode(Multimodal.mp4Samples(col("media"))).as("s"))
      .filter(col("s.is_sync"))
      .select("s.sample_index").as[Long].collect().sorted shouldBe
      Seq(1L, 4L)
  }

  test("mp4Samples: uniform stsz + absent stss (all sync), two tracks, v1 offsets") {
    val t1 = Mp4.sampledTrak(1L, 5000L, 320L, 240L, v1 = true,
      mediaTimescale = 90000L, mediaDuration = 800L,
      runs = Seq((2L, 3000L)), syncs = None, uniformSize = 444L)
    val t2 = Mp4.sampledTrak(2L, 5000L, 336L, 248L, v1 = false,
      mediaTimescale = 48000L, mediaDuration = 800L,
      runs = Seq((3L, 1024L)), syncs = Some(Seq(2L)), uniformSize = 0L,
      sizes = Seq(5L, 6L, 7L))
    val b = Mp4.encodeMovie("mp42", 600, 5000, Seq(t1, t2), mvhdV1 = true)
    val rows = media(1L -> b)
      .select(explode(Multimodal.mp4Samples(col("media"))).as("s"))
      .select("s.track_id", "s.media_timescale", "s.sample_index",
        "s.dts", "s.size", "s.is_sync")
      .orderBy("s.track_id", "s.sample_index")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    rows shouldBe Seq(
      (1L, 90000L, 1L, 0L, 444L, true),
      (1L, 90000L, 2L, 3000L, 444L, true),
      (2L, 48000L, 1L, 0L, 5L, false),
      (2L, 48000L, 2L, 1024L, 6L, true),
      (2L, 48000L, 3L, 2048L, 7L, false))
  }

  test("mp4Samples degrade contract: truncation, count mismatch, bad stss, sample bomb, trak without stbl") {
    def declinedSamples(b: Array[Byte]): Unit =
      withClue(s"bytes len ${b.length}: ") {
        media(1L -> b)
          .select(Multimodal.mp4Samples(col("media")).isNull.as("n"))
          .as[Boolean].head() shouldBe true
      }
    def movie(trak: Array[Byte]) = Mp4.encodeMovie("isom", 600, 5000, Seq(trak))
    val good = movie(Mp4.sampledTrak(1L, 5000L, 320L, 240L, v1 = false,
      mediaTimescale = 1000L, mediaDuration = 800L,
      runs = Seq((3L, 100L)), syncs = Some(Seq(1L)), uniformSize = 9L))
    // sanity: the good movie parses
    media(1L -> good)
      .select(org.apache.spark.sql.functions.size(
        Multimodal.mp4Samples(col("media"))).as("s"))
      .as[Int].head() shouldBe 3
    declinedSamples(good.take(60))                 // truncated mid-moov
    declinedSamples(movie(Mp4.sampledTrak(1L, 5000L, 320L, 240L,
      v1 = false, mediaTimescale = 1000L, mediaDuration = 800L,
      runs = Seq((3L, 100L)), syncs = None, uniformSize = 9L,
      stszCountOverride = Some(4L))))              // stsz count != stts total
    declinedSamples(movie(Mp4.sampledTrak(1L, 5000L, 320L, 240L,
      v1 = false, mediaTimescale = 1000L, mediaDuration = 800L,
      runs = Seq((3L, 100L)), syncs = Some(Seq(4L)), uniformSize = 9L)))
    // ^ stss sample number out of [1, total]
    declinedSamples(movie(Mp4.sampledTrak(1L, 5000L, 320L, 240L,
      v1 = false, mediaTimescale = 1000L, mediaDuration = 800L,
      runs = Seq((100000000L, 40L)), syncs = None, uniformSize = 9L)))
    // ^ a ~70-byte header DECLARING 1e8 samples: the cap refuses
    //   before any allocation
    declinedSamples(movie(Mp4.sampledTrak(1L, 5000L, 320L, 240L,
      v1 = false, mediaTimescale = 0L, mediaDuration = 800L,
      runs = Seq((3L, 100L)), syncs = None, uniformSize = 9L)))
    // ^ zero media timescale
    // a header-only trak (tkhd, no mdia/stbl): malformed for a
    // SAMPLE walk by contract
    declinedSamples(Mp4.encodeHeader("isom", 600, 1200, 1))
  }

  test("mp4Samples: interpreted and codegen paths agree (incl. the NULL rows)") {
    val d = media((1L to 10L).map { i =>
      val t = Mp4.sampledTrak(i, 5000L, 320L, 240L, v1 = i % 2 == 0,
        mediaTimescale = 100L * i, mediaDuration = 800L,
        runs = Seq((1L + i % 3, 10L + i), (1L + i % 2, 50L + i)),
        syncs = if (i % 4 == 0) None
                else Some((1L to (2L + i % 3 + i % 2)).filter(_ % 2 == 1)),
        uniformSize = if (i % 3 == 0) 77L + i else 0L,
        sizes = if (i % 3 == 0) Nil
                else (1L to (2L + i % 3 + i % 2)).map(k => 10 * k + i))
      val b = Mp4.encodeMovie("isom", 600, 5000, Seq(t))
      i -> (if (i == 7) b.take(50) else b)
    }: _*)
    def run(): Seq[(Long, Long, Long, Boolean)] = d
      .select(col("id"),
        explode(Multimodal.mp4Samples(col("media"))).as("s"))
      .select(col("id"), col("s.sample_index"), col("s.dts"),
        col("s.is_sync"))
      .orderBy("id", "s.sample_index")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    codegen.map(_._1).distinct should not contain 7L // NULL row drops
  }

  test("mp4Header: interpreted and codegen paths agree") {
    val d = media((1L to 12L).map(i =>
      i -> Mp4.encodeHeader(Seq("isom", "mp42")((i % 2).toInt),
        600 + i * 7, i * 1000 + 3, (i % 4).toInt,
        mvhdV1 = i % 3 == 0, freeBefore = i % 2 == 0,
        mdatBytes = (i % 5).toInt)): _*)
    def run(): Seq[(Long, String, Long)] = d
      .select(col("id"), Multimodal.mp4Header(col("media")).as("m"))
      .select(col("id"), col("m.major_brand"), col("m.duration_ms"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    codegen.map(_._2).distinct.sorted shouldBe Seq("isom", "mp42")
  }
}
