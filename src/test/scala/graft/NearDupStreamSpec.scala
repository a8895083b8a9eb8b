package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.NearDupStream

/** Streaming near-dup: a duplicate arriving in a LATER micro-batch is
  * matched against state from earlier batches; unrelated docs pair
  * with nothing; candidates agree with the batch LSH pipeline. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"

  test("cross-batch near-dup detected via bucket state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = NearDupStream.nearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), k = 5, numHashes = 64, bands = 16)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      mem.addData(1L -> base,
        2L -> "completely different content about spark query engines and columnar execution")
      q.processAllAvailable()
      assert(spark.table("neardup").count() == 0) // nothing similar yet
      // batch 2: near-dup of doc 1 (one word changed) + fresh noise
      mem.addData(3L -> base.replace("today", "tonight"),
        4L -> "yet another unrelated sentence with novel words entirely")
      q.processAllAvailable()
      val pairs = spark.table("neardup").as[NearDupStream.Candidate].collect()
      val hit = pairs.filter(p => p.a_id == 1L && p.b_id == 3L)
      assert(hit.nonEmpty, s"cross-batch dup not found in ${pairs.toSeq}")
      assert(hit.forall(_.est_jaccard > 0.5))
      assert(!pairs.exists(p => p.a_id == 2L || p.b_id == 2L || p.a_id == 4L || p.b_id == 4L))
    } finally q.stop()
  }

  test("batch mode: candidates match the batch LSH pipeline's pairs") {
    val docs = Seq(1L -> base, 2L -> (base + " extra"),
      3L -> "nothing in common with those documents at all whatsoever")
      .toDF("doc_id", "text")
    val streaming = NearDupStream.nearDupCandidates(docs, k = 5,
        numHashes = 64, bands = 16)
      .collect().map(c => (c.a_id, c.b_id)).toSet
    val batch = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 5, numHashes = 64, bands = 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(streaming == batch, s"streaming $streaming vs batch $batch")
  }
}
