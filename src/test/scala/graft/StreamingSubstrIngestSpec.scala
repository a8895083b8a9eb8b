package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The crawl-ingest loop for VERBATIM overlap (the D13 pattern over
  * the exact-substring machinery): a document stream is probed against
  * the PERSISTED winnow anchor index via foreachBatch, >= minLen
  * shared-run hits are flagged, and the batch's own anchors + text are
  * appended — a later micro-batch's verbatim overlap with an earlier
  * batch's doc is caught without re-winnowing the corpus. Exercises
  * the d17 operator as an incrementally-maintained parquet index,
  * replay safety (dedupIndex collapses re-appended anchors; the
  * duplicate text rows collapse in the per-pair max), and
  * only-the-batch-is-winnowed incrementality. */
class StreamingSubstrIngestSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long, seed: String): (Long, String) =
    (i, (0 until 30).map(j => s"${seed}w${(j * 31 + i * 7) % 97}").mkString(" "))

  test("foreachBatch maintains the anchor index; cross-batch overlaps are caught") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("substr_idx").toFile.getAbsolutePath
    val idxPath = s"$dir/winnow_index"
    val docsPath = s"$dir/docs"
    val hitsPath = s"$dir/hits"

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val haveIndex = new java.io.File(idxPath).exists()
        if (haveIndex) {
          val ss = batch.sparkSession
          // the r19 probe shape: the persisted index is touched
          // through its generation sidecar (tiered file pruning) —
          // NOT a full read per batch
          Dedup.exactSubstrPairsAgainstDir(ss, idxPath,
              ss.read.parquet(docsPath), batch,
              "doc_id", "text", minLen = 50, k = 16)
            .write.mode("append").parquet(hitsPath)
        }
        Dedup.winnowIndex(batch, "doc_id", "text", minLen = 50, k = 16)
          .write.mode("append").parquet(idxPath)
        batch.select("doc_id", "text").write.mode("append").parquet(docsPath)
        // index maintenance INSIDE the loop (the ingest cadence
        // shape): every pass is tail-bounded, probes stay correct
        // across the compaction boundary
        if (batchId == 1L)
          Dedup.compactAnchorIndex(batch.sparkSession, idxPath)
        ()
      }
      .start()
    try {
      // batch 1: corpus seed — docs 0..9 (mutually < 50 shared chars)
      mem.addData((0L until 10L).map(i => doc(i, s"s$i")): _*)
      q.processAllAvailable()
      // batch 2: doc 100 extends doc 3 verbatim, doc 101 fresh
      val (_, d3text) = doc(3L, "s3")
      mem.addData(Seq((100L, d3text + " extra"), doc(101L, "fresh")): _*)
      q.processAllAvailable()
      // batch 3: REPLAY batch 2 (partial-failure rerun) + doc 102
      // overlapping both doc 3 and the now-indexed doc 100
      mem.addData(Seq((100L, d3text + " extra"), doc(101L, "fresh"),
        (102L, d3text + " extra tail")): _*)
      q.processAllAvailable()

      val hits = spark.read.parquet(hitsPath)
        .select("corpus_id", "batch_id").distinct()
        .as[(Long, Long)].collect().toSet
      assert(hits.contains((3L, 100L)), s"batch-2 overlap missed: $hits")
      assert(hits.contains((100L, 102L)), s"index not incremental: $hits")
      assert(hits.contains((3L, 102L)), s"transitive corpus overlap missed: $hits")
      assert(!hits.contains((100L, 100L)), s"replayed self-pair: $hits")
      assert(!hits.exists(h => h._1 == 101L || h._2 == 101L), s"false hit: $hits")
      // the mid-stream compaction left a generation sidecar, and the
      // post-compaction batch (3) still probed correctly through it
      assert(new java.io.File(idxPath + "_keys").exists(),
        "mid-stream compaction must build the generation sidecar")
      assert(graft.sources.TieredIndex.load(spark, idxPath).isDefined)
    } finally q.stop()
  }
}
