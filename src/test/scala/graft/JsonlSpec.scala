package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.sources.Jsonl

/** JSONL corpus I/O: pinned-schema read, corrupt-line quarantine
  * (captured, not fatal, not dropped), FAILFAST escalation, and a
  * write round trip. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("pinned-schema read parses good lines and quarantines bad ones") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "ok"}""",
      """{"doc_id": 3 "text": "missing comma"}""", // malformed
      """not json at all"""))
    val (good, bad) = Jsonl.readWithQuarantine(spark, path, schema)
    assert(good.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "hello world"), (2L, "ok")))
    assert(bad.count() == 2, "both malformed lines must be quarantined")
    assert(bad.as[String].collect().exists(_.contains("missing comma")))
  }

  test("FAILFAST aborts on corruption instead of quarantining") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "fine"}""", """garbage"""))
    val e = intercept[Exception] {
      Jsonl.read(spark, path, schema, mode = "FAILFAST").collect()
    }
    assert(e.getMessage != null)
  }

  test("write round trip preserves rows") {
    val dir = Files.createTempDirectory("jsonl_rt").toString + "/out"
    val df = Seq((10L, "a b c"), (11L, "d e")).toDF("doc_id", "text")
    Jsonl.write(df, dir)
    val (good, bad) = Jsonl.readWithQuarantine(spark, dir, schema)
    assert(bad.count() == 0)
    assert(good.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((10L, "a b c"), (11L, "d e")))
  }

  test("inferFromSample recovers the field set for pinning") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "x"}""", """{"doc_id": 2, "text": "y"}"""))
    val inferred = Jsonl.inferFromSample(spark, path, samplingRatio = 1.0)
    assert(inferred.fieldNames.toSet == Set("doc_id", "text"))
  }
}
