package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.ShardSink
import graft.streaming.CorpusIngest

/** p10 — the full ingest loop as ONE streaming pipeline, proven by
  * differential: the same rows through (a) three micro-batches with
  * persisted bloom state and (b) the batch twin (ingestBatch once on
  * the union) must ship the identical survivor set into shards with
  * identical manifests. Every drop reason is planted: in-batch URL
  * chrome variant, in-batch text dup, cross-batch URL dup, cross-batch
  * text dup, Gopher-gate failure, full replay of a batch. */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private val stops = ("the be to of and that have with " * 8).trim
  private def good(i: Long) =
    s"$stops alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"

  test("streaming pipeline == batch twin; all planted drops happen") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ingest").toString
    val (ub, tb, shards) = (s"$dir/url_bloom", s"$dir/text_bloom", s"$dir/shards")

    val b1 = Seq(
      (1L, "https://site.com/p1"), (2L, "https://site.com/p2"),
      (3L, "https://site.com/p3"), (4L, "https://site.com/p4"),
      (5L, "https://site.com/p5"), (6L, "https://site.com/p6"),
      (7L, "https://site.com/p7"), (8L, "https://site.com/p8"),
      (9L, "https://site.com/p9"), (10L, "https://site.com/p10"))
      .map { case (id, u) => (u, id, good(id)) } ++ Seq(
      // chrome variant of p1 → in-batch URL dup, min doc_id (1) wins
      ("HTTPS://WWW.site.com:443/p1?utm_source=x#f", 11L, good(11)),
      // same text as doc 2 under a new URL → in-batch text dup
      ("https://site.com/p12", 12L, good(2)))
    val b2 = Seq(
      ("https://site.com/p3?ref=tw", 13L, good(13)), // cross-batch URL dup
      ("https://site.com/p14", 14L, good(4)),        // cross-batch text dup
      ("https://site.com/p15", 15L, good(15)),       // genuinely new
      ("https://site.com/p16", 16L, "too few words")) // Gopher gate
    val b3 = b2 // full replay: the loop must go quiet

    val mem = MemoryStream[(String, Long, String)]
    val q = CorpusIngest.start(
      mem.toDF().toDF("url", "doc_id", "text"), ub, tb, shards, numShards = 4)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val expected = ((1L to 10L) :+ 15L).toSet
    val streamed = spark.read.parquet(shards)
    assert(streamed.select("doc_id").as[Long].collect().toSet == expected)

    // batch twin over the union, fresh state
    val (ub2, tb2, shards2) = (s"$dir/u2", s"$dir/t2", s"$dir/s2")
    CorpusIngest.ingestBatch((b1 ++ b2 ++ b3).toDF("url", "doc_id", "text"),
      ub2, tb2, shards2, numShards = 4)
    val batch = spark.read.parquet(shards2)
    assert(batch.select("doc_id").as[Long].collect().toSet == expected)

    // identical shard rows (id, url, text, rank, shard) and manifests
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "rk", "doc_id", "canon_url", "text")
        .orderBy("shard", "rk").collect().map(_.toSeq).toSeq
    assert(canon(streamed) == canon(batch))
    assert(ShardSink.manifestsFromDisk(spark, shards, "doc_id")
      .collect().map(_.toSeq).toSeq ==
      ShardSink.manifestsFromDisk(spark, shards2, "doc_id")
        .collect().map(_.toSeq).toSeq)

    // training order within the union of a shard's files: resume read
    // from rank -1 must be rk-sorted and complete for that shard
    val s0 = ShardSink.resumeShard(spark, shards, 0, -1L)
      .select("rk").as[Long].collect()
    assert(s0.sorted.sameElements(s0) && s0.nonEmpty)
  }
}
