package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Bm25

/** The crawl-ingest loop for LEXICAL RETRIEVAL (the D13 pattern over
  * the BM25 inverted index): a document stream appends each batch's
  * postings to a parquet index via foreachBatch — only the batch is
  * tokenized, the corpus is never re-read — and probes against the
  * accumulated index are bit-identical to probing a full rebuild.
  *
  * Replay safety: a replayed batch re-appends identical posting rows;
  * `distinct()` at read time collapses them, and corpus stats are
  * DERIVED from the deduped postings (n_docs / tot from the distinct
  * (doc_id, dl) pairs) rather than stored per batch — so a
  * partial-failure rerun cannot double-count document lengths. */
class StreamingRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long): (Long, String) =
    (i, (0 until 20).map(j => s"w${(j * 13 + i * 7) % 23}").mkString(" "))

  test("foreachBatch maintains the postings index; probe == full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("bm25_ingest").toFile.getAbsolutePath
    val postingsPath = s"$dir/postings"

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Bm25.buildIndex(batch, "doc_id", "text")
          .postings.write.mode("append").parquet(postingsPath)
        ()
      }
      .start()
    try {
      val b1 = (0L until 10L).map(doc)
      val b2 = (10L until 15L).map(doc)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable() // replay (rerun after partial failure)

      val postings = spark.read.parquet(postingsPath).distinct()
      val stats = postings.select("doc_id", "dl").distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      val streamed = Bm25.Bm25Index(postings, stats)
      val rebuilt = Bm25.buildIndex(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")

      val queries = Seq((0L, "w0 w5"), (1L, "w11 w22")).toDF("q_id", "qtext")
      def run(i: Bm25.Bm25Index) =
        Bm25.topKQueriesFromIndex(i, queries, "q_id", "qtext")
          .select("q_id", "doc_id", "dl", "score_ppm", "rk")
          .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
      val s = run(streamed)
      assert(s == run(rebuilt) && s.nonEmpty)
      // the replayed batch added no phantom documents
      assert(stats.as[(Long, Long)].head()._1 == 15L)
    } finally q.stop()
  }
}
