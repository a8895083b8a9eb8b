package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.ParaDedup

/** The crawl-ingest loop for PARAGRAPH dedup (the D13 shape over the
  * segment index): each micro-batch is cleaned against the persisted
  * segment index via foreachBatch, the cleaned docs are emitted, and
  * only the batch's surviving segments are appended — corpus text is
  * never re-read. Exercises cross-batch cuts, within-batch keep-first,
  * owner-based replay safety, and index canonicality. */
class StreamingParaDedupSpec extends SparkSpec {
  import spark.implicits._

  private val segA = (1 to 10).map(i => s"a$i").mkString(" ")
  private val segB = (1 to 10).map(i => s"b$i").mkString(" ")
  private val segC = (1 to 10).map(i => s"c$i").mkString(" ")
  private val segD = (1 to 10).map(i => s"d$i").mkString(" ")

  test("foreachBatch segment index: cross-batch cuts, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("para_idx").toFile.getAbsolutePath
    val idxPath = s"$dir/seg_index"
    val outPath = s"$dir/cleaned"

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        val idx =
          if (new java.io.File(idxPath).exists()) ss.read.parquet(idxPath)
          else ss.emptyDataFrame
            .select(lit(0L).as("doc_id"), lit("").as("seg")).limit(0)
        val cleaned = ParaDedup.cleanAgainstIndex(idx, batch, "doc_id", "text")
          .localCheckpoint(true)
        cleaned.write.mode("append").parquet(outPath)
        ParaDedup.segments(cleaned.filter(length(col("text")) > 0),
            "doc_id", "text")
          .select("doc_id", "seg")
          .write.mode("append").parquet(idxPath)
        ()
      }
      .start()
    try {
      // batch 1: doc 0 owns segA+segB; doc 1 repeats segA within-batch
      mem.addData((0L, s"$segA $segB"), (1L, s"$segA $segC"))
      q.processAllAvailable()
      // batch 2: doc 10 repeats segB (cross-batch) + brings segD;
      //          doc 11 is fully unoriginal (segA segC)
      mem.addData((10L, s"$segB $segD"), (11L, s"$segA $segC"))
      q.processAllAvailable()
      // batch 3: REPLAY batch 2 verbatim (partial-failure rerun)
      mem.addData((10L, s"$segB $segD"), (11L, s"$segA $segC"))
      q.processAllAvailable()

      val out = spark.read.parquet(outPath)
        .select("doc_id", "text", "n_segs", "n_kept")
        .as[(Long, String, Long, Long)].collect()
      val first = out.groupBy(_._1).map { case (k, v) => k -> v.head }

      assert(first(0L)._2 == s"$segA $segB", "first owner keeps everything")
      assert(first(1L)._2 == segC, "within-batch keep-first cuts segA")
      assert(first(10L)._2 == segD, "cross-batch cut via the index")
      assert(first(11L)._2 == "" && first(11L)._4 == 0L,
        "fully-unoriginal doc empties")
      // replay safety: batch 3's doc 10 sees ITS OWN segD in the index
      // and must keep it again, not wipe itself
      val replays10 = out.filter(_._1 == 10L).map(_._2).toSet
      assert(replays10 == Set(segD), s"replay must be a no-op: $replays10")
      // index canonicality: one owner per segment text
      val owners = spark.read.parquet(idxPath)
        .groupBy("seg").agg(countDistinct(col("doc_id")).as("n"))
        .filter(col("n") > 1).count()
      assert(owners == 0L, "a segment text must have exactly one owner")
    } finally q.stop()
  }

  test("owner-first: re-ingested owner beats a lower-id newcomer (ADVICE r10)") {
    val idx = Seq((5L, segA)).toDF("doc_id", "seg")
    val batch = Seq((2L, s"$segA $segB"), (5L, segA)).toDF("doc_id", "text")
    val got = ParaDedup.cleanAgainstIndex(idx, batch, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(5L) == segA, "index owner keeps its text on re-ingest")
    assert(got(2L) == segB, "newcomer loses the owned segment, keeps fresh text")
  }

  test("null-text docs pass through instead of vanishing (ADVICE r10)") {
    val batch = Seq((0L, Option(segA)), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val empty = batch.select(col("doc_id"), col("text").as("seg")).limit(0)
    val got = ParaDedup.cleanAgainstIndex(empty, batch, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.keySet == Set(0L, 1L), "every batch doc yields an output row")
    assert(got(1L) == "", "null text cleans to empty, not to a missing row")
  }

  test("batch operator ≡ t30 on a fresh corpus (empty index)") {
    val docs = Seq((0L, s"$segA $segB"), (1L, s"$segA $segD")).toDF("doc_id", "text")
    val empty = docs.select(col("doc_id"), col("text").as("seg")).limit(0)
    val got = ParaDedup.cleanAgainstIndex(empty, docs, "doc_id", "text")
      .select("doc_id", "n_segs", "n_kept").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // same totals t30's window formulation produces on this corpus
    assert(got == Map(0L -> ((2L, 2L)), 1L -> ((2L, 1L))))
  }
}
