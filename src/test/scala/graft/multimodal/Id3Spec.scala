package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

class Id3Spec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  private def media(rows: (Long, Array[Byte])*) =
    df(schema, rows.map { case (i, b) => Row(i, b) }: _*)

  private def rowsOf(b: Array[Byte]) = media(1L -> b)
    .select(explode(Id3.id3Frames(col("media"))).as("f"))
    .select("f.frame_index", "f.frame_id", "f.frame_size", "f.text")
    .orderBy("f.frame_index")
    .as[(Long, String, Long, Option[String])].collect().toSeq

  test("id3Frames: v2.3 and v2.4 size arithmetic, both text encodings, padding stop") {
    for (major <- Seq(3, 4)) {
      val tag = Id3.tag(major, Seq(
        Id3.textFrame("TIT2", "Hello", major, utf8 = true),
        Id3.textFrame("TPE1", "World", major, utf8 = false),
        Id3.binFrame("PRIV", Array[Byte](1, 2, 3), major)),
        padding = 7)
      val rows = rowsOf(tag)
      withClue(s"major $major: ") {
        rows shouldBe Seq(
          (0L, "TIT2", 6L, Some("Hello")),
          (1L, "TPE1", 6L, Some("World")),
          (2L, "PRIV", 3L, None))
      }
    }
    // a genuinely syncsafe-needing size (v2.4 frame > 127 bytes)
    val big = "x" * 300
    val rows4 = rowsOf(Id3.tag(4, Seq(Id3.textFrame("TIT2", big, 4))))
    rows4.head._3 shouldBe 301L
    rows4.head._4 shouldBe Some(big)
  }

  test("id3Frames degrade contract: magic, version, syncsafe violation, overrun, zero frames") {
    def declined(b: Array[Byte]): Unit = media(1L -> b)
      .select(Id3.id3Frames(col("media")).isNull.as("n"))
      .as[Boolean].head() shouldBe true
    val good = Id3.tag(3, Seq(Id3.textFrame("TIT2", "ok", 3)))
    declined(good.take(12))                      // truncated mid-frame
    declined { val c = good.clone(); c(0) = 'X'.toByte; c }
    declined { val c = good.clone(); c(3) = 2.toByte; c }  // v2.2 unsupported
    declined { val c = good.clone(); c(6) = 0x80.toByte; c } // non-syncsafe tag size
    declined(Id3.tag(3, Nil))                    // zero frames
    declined { // frame claims more than the tag holds
      val c = good.clone(); c(10 + 7) = 100.toByte; c
    }
    declined(Array[Byte](1, 2, 3))
  }

  test("id3Frames: interpreted and codegen paths agree") {
    val d = media((1L to 10L).map(i =>
      i -> Id3.tag((3 + i % 2).toInt,
        Seq(Id3.textFrame("TIT2", s"T$i", (3 + i % 2).toInt),
          Id3.binFrame("PRIV", Array.fill((i % 4).toInt + 1)(7), (3 + i % 2).toInt)),
        padding = (i % 3).toInt)): _*)
    def run(): Seq[(Long, Long, String)] = d
      .select(col("id"), explode(Id3.id3Frames(col("media"))).as("f"))
      .select(col("id"), col("f.frame_index"), col("f.frame_id"))
      .orderBy("id", "f.frame_index")
      .as[(Long, Long, String)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    codegen.size shouldBe 20
  }
}
