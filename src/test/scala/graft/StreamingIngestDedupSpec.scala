package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The production crawl-ingest loop, end to end: a document stream is
  * probed against a PERSISTED MinHash index via foreachBatch, dups are
  * flagged, and the batch's own signatures are appended to the index —
  * so a later micro-batch's near-dup of an earlier batch's doc is
  * caught without ever re-shingling the corpus. Exercises: the d9
  * cross-batch operator as an incrementally-maintained parquet index,
  * replay safety (dedupIndex=true collapses a re-appended batch), and
  * only-the-batch-is-hashed incrementality. */
class StreamingIngestDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long, seed: String): (Long, String) =
    (i, (0 until 30).map(j => s"${seed}w${(j * 31 + i * 7) % 97}").mkString(" "))

  test("foreachBatch maintains the index; cross-batch dups are caught") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ingest_idx").toFile.getAbsolutePath
    val idxPath = s"$dir/minhash_index"
    val hitsPath = s"$dir/hits"

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val haveIndex = new java.io.File(idxPath).exists()
        if (haveIndex) {
          val idx = batch.sparkSession.read.parquet(idxPath)
          Dedup.minhashLshPairsAgainst(idx, batch, "doc_id", "text",
              k = 5, numHashes = 128, bands = 16)
            .write.mode("append").parquet(hitsPath)
        }
        Dedup.minhashIndex(batch, "doc_id", "text",
            k = 5, numHashes = 128, bands = 16)
          .write.mode("append").parquet(idxPath)
        ()
      }
      .start()
    try {
      // batch 1: corpus seed — docs 0..9
      mem.addData((0L until 10L).map(i => doc(i, s"s$i")): _*)
      q.processAllAvailable()
      // batch 2: doc 100 near-dups doc 3 (same words + suffix), doc 101 fresh
      val (d3id, d3text) = doc(3L, "s3")
      mem.addData(Seq((100L, d3text + " extra"), doc(101L, "fresh")): _*)
      q.processAllAvailable()
      // batch 3: REPLAY batch 2 (partial-failure rerun) + doc 102
      // near-dupping doc 100 from batch 2
      mem.addData(Seq((100L, d3text + " extra"), doc(101L, "fresh"),
        (102L, d3text + " extra tail")): _*)
      q.processAllAvailable()

      val hits = spark.read.parquet(hitsPath)
        .select("corpus_id", "batch_id").distinct()
        .as[(Long, Long)].collect().toSet
      // cross-batch catches: 100 vs corpus doc 3 (twice: batch 2 and
      // its replay), 102 vs 3 and vs the now-indexed 100
      assert(hits.contains((3L, 100L)), s"batch-2 dup missed: $hits")
      assert(hits.contains((100L, 102L)), s"index not incremental: $hits")
      assert(hits.contains((3L, 102L)), s"transitive corpus dup missed: $hits")
      // replay safety: the replayed doc 100 must not self-pair even
      // though its rows sit in the index twice
      assert(!hits.contains((100L, 100L)), s"replayed self-pair: $hits")
      // fresh docs never collide
      assert(!hits.exists(h => h._1 == 101L || h._2 == 101L), s"false hit: $hits")
    } finally q.stop()
  }
}
