package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  private def media(rows: (Long, Array[Byte])*) =
    df(schema, rows.map { case (i, b) => Row(i, b) }: _*)

  private def rowsOf(b: Array[Byte]) = media(1L -> b)
    .select(explode(Warc.warcRecords(col("media"))).as("r"))
    .select("r.record_index", "r.warc_type", "r.target_uri",
      "r.content_type", "r.content_length", "r.block_md5")
    .orderBy("r.record_index")
    .as[(Long, String, Option[String], Option[String], Long, String)]
    .collect().toSeq

  test("warcRecords: hand-built two-record archive — fields, offsets, digest") {
    val payload = "<html>hello</html>".getBytes("US-ASCII")
    val a = Warc.archive(
      Warc.record("warcinfo", None, Some("application/warc-fields"),
        "software: test\r\n".getBytes("US-ASCII")),
      Warc.record("response", Some("http://x.example/"),
        Some("text/html"), payload,
        extraHeaders = Seq("WARC-Record-ID" -> "<urn:uuid:1>")))
    val rows = rowsOf(a)
    rows.map(r => (r._1, r._2)) shouldBe Seq((0L, "warcinfo"), (1L, "response"))
    rows(0)._3 shouldBe None
    rows(1)._3 shouldBe Some("http://x.example/")
    rows(1)._4 shouldBe Some("text/html")
    rows(1)._5 shouldBe payload.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    rows(1)._6 shouldBe md.digest(payload).map("%02x".format(_)).mkString
  }

  test("warcRecords: header names are case-insensitive; unknown headers pass through") {
    val b = ("WARC/1.0\r\n" +
      "warc-type: metadata\r\n" +
      "CONTENT-LENGTH: 2\r\n" +
      "X-Custom: anything: with colons\r\n" +
      "\r\nok\r\n\r\n").getBytes("US-ASCII")
    val rows = rowsOf(b)
    rows.map(r => (r._2, r._5)) shouldBe Seq(("metadata", 2L))
  }

  test("warcRecords degrade contract: truncation, bad version, bad lengths, lost terminator") {
    def declined(b: Array[Byte]): Unit = media(1L -> b)
      .select(Warc.warcRecords(col("media")).isNull.as("n"))
      .as[Boolean].head() shouldBe true
    val good = Warc.archive(Warc.record("response",
      Some("http://x/"), Some("text/html"), "abc".getBytes("US-ASCII")))
    declined(good.dropRight(1))          // truncated terminator
    declined(good.dropRight(5))          // truncated block
    declined { val c = good.clone(); c(0) = 'X'.toByte; c } // bad magic
    declined("WARC/2.0\r\nWARC-Type: x\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
      .getBytes("US-ASCII"))             // unknown version
    declined("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: nope\r\n\r\n\r\n\r\n"
      .getBytes("US-ASCII"))             // non-numeric length
    declined("WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
      .getBytes("US-ASCII"))             // missing mandatory WARC-Type
    declined(Array[Byte](1, 2, 3))
    // a trailing junk byte after a valid record breaks the walk LOUDLY
    declined(good ++ Array[Byte]('j'))
  }

  test("warcRecords: interpreted and codegen paths agree") {
    val d = media((1L to 10L).map(i =>
      i -> Warc.archive((0L to i % 3).map(r =>
        Warc.record(if (r == 0) "warcinfo" else "response",
          if (r == 0) None else Some(s"http://h$i/p$r"),
          Some("text/plain"),
          s"body $i $r".getBytes("US-ASCII"))): _*)): _*)
    def run(): Seq[(Long, Long, String)] = d
      .select(col("id"), explode(Warc.warcRecords(col("media"))).as("r"))
      .select(col("id"), col("r.record_index"), col("r.block_md5"))
      .orderBy("id", "r.record_index")
      .as[(Long, Long, String)].collect().toSeq
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
    codegen.size shouldBe (1 to 10).map(i => (i % 3 + 1).toInt).sum
  }
}
