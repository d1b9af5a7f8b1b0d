package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h"))).as[String].head()

  test("script/style/comment subtrees are dropped with their contents") {
    extract("<p>keep</p><script>var hidden = 'leak';</script>" +
      "<style>body { display: none }</style><!-- secret -->tail") shouldBe
      "keep\ntail"
  }

  test("block tags become line breaks, inline tags become spaces") {
    extract("<h1>Title</h1><p>one <b>bold</b> word</p><div>footer</div>") shouldBe
      "Title\none bold word\nfooter"
  }

  test("entities decode after tag stripping — no double-decode resurrection") {
    // &lt;b&gt; must decode to the literal text <b>, not get stripped as a tag
    extract("<p>a &amp;&amp; b &lt;b&gt; c &quot;q&quot; &#39;s&#39;&nbsp;end</p>") shouldBe
      "a && b <b> c \"q\" 's' end"
  }

  test("whitespace collapses: runs to one space, blank lines to one newline") {
    extract("<p>a\t\t b</p>\n\n\n<p>   c   </p>") shouldBe "a b\nc"
  }

  test("title extracted and trimmed; NULL when absent") {
    val df = Seq("<title> My Page </title>", "<p>no title</p>").toDF("h")
      .select(Html.extractTitle(col("h")).as("t"))
    df.as[Option[String]].collect().toSeq shouldBe Seq(Some("My Page"), None)
  }

  test("links harvested in document order, both quote styles") {
    Seq("""<a href="http://a/1">x</a> <a class=k href='http://a/2'>y</a>""")
      .toDF("h").select(Html.extractLinks(col("h")).as("l"))
      .as[Seq[String]].head() shouldBe Seq("http://a/1", "http://a/2")
  }
}
