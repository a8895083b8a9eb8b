package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Streaming decontamination (SURVEY §2.8 P2 + §2.6): the eval-gram
  * probe is a stateless broadcast join + per-document aggregation, so
  * it composes directly with a document stream — contaminated crawl
  * records are flagged IN-FLIGHT (update-mode per-doc counts), no
  * unbounded state beyond the micro-batch aggregation. */
class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("contaminated stream docs are flagged against broadcast eval grams") {
    implicit val sqlCtx = spark.sqlContext
    val evalDf = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val evalGrams = broadcast(
      evalDf.select(explode(TextOps.shingles(col("text"), 8)).as("g")).distinct()
        .withColumn("__hit", lit(1)))

    val mem = MemoryStream[(Long, String)]
    val streamed = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 8)).as("g"))
      .join(evalGrams, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_shared"))
    val q = streamed.writeStream.format("memory").queryName("decontam")
      .outputMode("update").start()
    try {
      mem.addData(
        (10L, "prefix then the quick brown fox jumps over the lazy dog tonight suffix"),
        (11L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq"))
      q.processAllAvailable()
      val rows = spark.table("decontam")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(rows(10L)._2 > 30, s"planted doc must share many 8-grams: $rows")
      assert(rows(11L)._2 == 0, s"clean doc must share none: $rows")
    } finally q.stop()
  }
}
