package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hand-placed documents for t33's Gopher document-shape rules —
  * the synthetic corpus has no newlines/bullets/ellipses/symbols, so
  * the driver oracle alone would leave those rules vacuously green;
  * these rows exercise each rule's trip wire individually. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def runOn(docs: Seq[(Long, String)]) = {
    val dir = Files.createTempDirectory("gopher").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("t33_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private val goodBody = (("the be to of and that have with " * 8).trim + " " +
    ("alpha beta gamma delta " * 6).trim) // 88 words, all alphabetic

  test("each rule trips on its designed row and only there") {
    val rows = Seq(
      1L -> goodBody,                                   // passes all
      2L -> "too short with the of be",                 // n_words < 50
      3L -> goodBody.split(" ").map(w => w + "##########").mkString(" "), // mean_wlen > 10, hash ratio
      4L -> (goodBody + " " + Seq.fill(20)("#").mkString(" ")), // hash_ratio > 0.1
      5L -> (goodBody + " " + Seq.fill(20)("...").mkString(" ")), // ellipsis_ratio
      6L -> goodBody.split(" ").map(w => "- " + w).mkString("\n"), // bullets (and word count doubles)
      7L -> (goodBody + "\n" + "this line trails off...\n" + "so does this one..."), // ellipsis lines: 2 of 3 > 0.3
      8L -> goodBody.split(" ").map(w => "123").mkString(" "),    // alpha_frac 0 (+ mean_wlen 3.0 stays in band)
      9L -> ("alpha beta gamma delta " * 22).trim)       // 88 words, no stop words
    val out = runOn(rows)
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Long]("n_words") == 88L)
    assert(out(1L).getAs[Long]("n_stops") >= 2L)
    assert(!out(2L).getAs[Boolean]("keep") &&
      out(2L).getAs[Long]("n_words") < 50)
    assert(!out(3L).getAs[Boolean]("keep") &&
      out(3L).getAs[Double]("mean_wlen") > 10.0)
    assert(!out(4L).getAs[Boolean]("keep") &&
      out(4L).getAs[Double]("hash_ratio") > 0.1)
    assert(!out(5L).getAs[Boolean]("keep") &&
      out(5L).getAs[Double]("ellipsis_ratio") > 0.1)
    assert(!out(6L).getAs[Boolean]("keep") &&
      out(6L).getAs[Double]("bullet_frac") > 0.9)
    assert(!out(7L).getAs[Boolean]("keep") &&
      out(7L).getAs[Double]("ellipsis_line_frac") > 0.3)
    assert(!out(8L).getAs[Boolean]("keep") &&
      out(8L).getAs[Double]("alpha_frac") < 0.8)
    assert(!out(9L).getAs[Boolean]("keep") &&
      out(9L).getAs[Long]("n_stops") < 2)
  }
}
