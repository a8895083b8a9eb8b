package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** TextOps.htmlExtract: element stripping, line structure, entity
  * decoding, and the line-density boilerplate filter. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minWords: Int = 5): String =
    Seq(html).toDF("h")
      .select(TextOps.htmlExtract(col("h"), minWords).as("c"))
      .as[String].head()

  test("script and style elements vanish whole, across newlines") {
    val got = extract(
      "<p>alpha beta gamma delta epsilon</p>" +
        "<script>\nvar x = \"code words should never appear\";\n</script>" +
        "<style>p { color: red }</style>" +
        "<p>one two three four five six</p>")
    assert(got == "alpha beta gamma delta epsilon\none two three four five six")
  }

  test("block closers and <br> keep line structure; inline tags do not") {
    val got = extract(
      "<div>first line has five words</div>" +
        "second line <b>with</b> <i>inline</i> markup here<br>" +
        "third line also has enough words", minWords = 5)
    assert(got.split("\n").toSeq == Seq(
      "first line has five words",
      "second line with inline markup here",
      "third line also has enough words"))
  }

  test("entities decode once, amp last") {
    val got = extract("<p>a &lt;tag&gt; &quot;q&quot; &amp; more words here</p>")
    assert(got == "a <tag> \"q\" & more words here")
    // &amp;lt; must NOT double-decode into a stripped tag: the literal
    // text "&lt;" survives as "<" only via its own entity, and the
    // amp-decode result "&lt;" stays literal
    val tricky = extract("<p>escaped entity &amp;lt; stays literal text here</p>")
    assert(tricky.contains("&lt;"), s"got $tricky")
  }

  test("line-density filter drops chrome, keeps prose") {
    val got = extract(
      "<div class=\"nav\"><a href=\"/\">home</a> <a href=\"/c\">about</a></div>" +
        "<h1>Short Title</h1>" +
        "<p>this paragraph certainly has more than five words in it</p>" +
        "<div class=\"footer\">&copy; 2026</div>")
    assert(got == "this paragraph certainly has more than five words in it")
  }

  test("degenerate inputs: empty, tag-only, no-html text") {
    assert(extract("") == "")
    assert(extract("<div><br><p></p></div>") == "")
    assert(extract("plain text with no markup at all") ==
      "plain text with no markup at all")
  }

  test("p7 crawl pipeline: per-lang yield covers the corpus, dedup sane") {
    val out = SparkEntry.queries("p7_crawl_pipeline")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select(col("n_pages"), col("n_kept"), col("chars_kept"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, k, c) =>
      assert(k >= 1 && k <= n, "keep-first keeps at least one per group")
      assert(c > 0, "extraction must retain prose")
    }
  }

  test("t28 catalog query: every doc retains content, chrome dropped") {
    val out = SparkEntry.queries("t28_html_extract")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select(col("clean_chars"), col("n_lines"),
      col("retained_ppm")).as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (chars, lines, ppm) =>
      assert(chars > 0 && lines >= 1, "the entity paragraph always survives")
      assert(ppm > 0 && ppm < 1000000L, s"retained_ppm out of band: $ppm")
    }
  }
}
