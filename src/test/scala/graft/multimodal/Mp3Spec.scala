package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

class Mp3Spec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  private def media(rows: (Long, Array[Byte])*) =
    df(schema, rows.map { case (i, b) => Row(i, b) }: _*)

  private def rows(b: Array[Byte]) = media(1L -> b)
    .select(explode(Mp3.mp3Frames(col("media"))).as("f"))
    .select("f.frame_index", "f.byte_offset", "f.bitrate_kbps",
      "f.sample_rate", "f.padding", "f.has_crc", "f.frame_bytes")
    .orderBy("f.frame_index")
    .as[(Long, Long, Long, Long, Boolean, Boolean, Long)].collect().toSeq

  test("mp3Frames: hand-built stream — frame lengths from the spec formula, offsets cumulative") {
    // idx 9 = 128 kbps at 44100: floor(144*128000/44100) = 417
    val b = Mp3.encodeStream(Seq(
      (9, 0, false, false), (9, 0, true, false), (11, 1, false, true)))
    // idx 11 = 192 kbps at 48000: floor(144*192000/48000) = 576
    rows(b) shouldBe Seq(
      (0L, 0L, 128L, 44100L, false, false, 417L),
      (1L, 417L, 128L, 44100L, true, false, 418L),
      (2L, 835L, 192L, 48000L, false, true, 576L))
  }

  test("mp3Frames: ID3v2 prefix skipped by syncsafe size, ID3v1 trailer ends the walk") {
    val tag = Id3.tag(3, Seq(Id3.textFrame("TIT2", "Song", 3, utf8 = false)),
      padding = 5)
    val b = Mp3.encodeStream(Seq((1, 2, false, false), (14, 0, true, false)),
      id3v2 = Some(tag), id3v1Trailer = true)
    // idx 1 = 32 kbps at 32000: 144*32000/32000 = 144
    // idx 14 = 320 kbps at 44100: floor(144*320000/44100) = 1044 + 1 pad
    val r = rows(b)
    r.map(_._1) shouldBe Seq(0L, 1L)
    r.head._2 shouldBe tag.length.toLong // first frame starts after the tag
    r.head._7 shouldBe 144L
    r(1)._2 shouldBe tag.length + 144L
    r(1)._7 shouldBe 1045L
    // duration/pricing read: total bytes accounted for, trailer excluded
    (r(1)._2 + r(1)._7 + 128) shouldBe b.length.toLong
  }

  test("mp3Frames degrade contract: truncation, lost sync, free/bad bitrate, reserved rate, wrong version/layer, garbage") {
    def declined(b: Array[Byte]): Unit =
      withClue(s"bytes len ${b.length}: ") {
        media(1L -> b)
          .select(Mp3.mp3Frames(col("media")).isNull.as("n"))
          .as[Boolean].head() shouldBe true
      }
    val good = Mp3.encodeStream(Seq((9, 0, false, false), (9, 0, false, false)))
    rows(good).length shouldBe 2 // sanity
    declined(good.take(good.length - 3))            // truncated mid-frame
    declined { val c = good.clone(); c(0) = 0x12; c }   // lost sync
    declined { val c = good.clone(); c(2) = 0x00; c }   // free bitrate (idx 0)
    declined { val c = good.clone(); c(2) = 0xf0.toByte; c } // bad bitrate (15)
    declined { val c = good.clone(); c(2) = (0x90 | 0x0c).toByte; c } // sr idx 3
    declined { val c = good.clone(); c(1) = 0xf3.toByte; c } // MPEG-2 version
    declined { val c = good.clone(); c(1) = 0xfd.toByte; c } // Layer II
    declined(good ++ Array[Byte](1, 2, 3))          // trailing garbage
    declined(Array[Byte](0, 1, 2))                  // too short
    // ID3v2 prefix with a non-syncsafe size byte
    val tag = Id3.tag(4, Seq(Id3.textFrame("TIT2", "x", 4)), padding = 0)
    val pre = Mp3.encodeStream(Seq((9, 0, false, false)), id3v2 = Some(tag))
    declined { val c = pre.clone(); c(6) = 0x80.toByte; c }
    // prefix claiming more bytes than the stream holds
    declined { val c = pre.clone(); c(9) = 0x7f.toByte; c }
  }

  test("mp3Frames: interpreted and codegen paths agree (incl. the NULL rows)") {
    val d = media((1L to 12L).map { i =>
      val frames = (1L to (1 + i % 4)).map(k =>
        ((1 + (i + 3 * k) % 14).toInt, ((i + k) % 3).toInt,
          (i + k) % 2 == 0, (i + k) % 5 == 0))
      val b = Mp3.encodeStream(frames,
        id3v2 = if (i % 4 == 0)
          Some(Id3.tag(3, Seq(Id3.textFrame("TIT2", s"T$i", 3)), 2))
        else None,
        id3v1Trailer = i % 3 == 0)
      i -> (if (i == 5) b.take(b.length - 2) else b)
    }: _*)
    def run(): Seq[(Long, Long, Long)] = d
      .select(col("id"), explode(Mp3.mp3Frames(col("media"))).as("f"))
      .select(col("id"), col("f.byte_offset"), col("f.frame_bytes"))
      .orderBy("id", "f.byte_offset")
      .as[(Long, Long, Long)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    codegen.map(_._1).distinct should not contain 5L // truncated drops
  }
}
