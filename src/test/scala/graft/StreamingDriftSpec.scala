package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Drift

/** Streaming drift monitor — the use t36's count tables' mergeability
  * exists for: each micro-batch builds (source, bucket) and
  * (source, token) count increments and merges them into persisted
  * stores (bounded: nBuckets·|sources| + vocab rows, whatever the
  * stream's volume); the drift card reads the stores at any point.
  * Because counts are a commutative monoid, the store after N batches
  * equals the one-shot batch counts, so the streamed card is EXACTLY
  * the batch card — the same merge-equals-batch contract the t34
  * quantile monitor pins. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch count merge yields exactly the one-shot drift card") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("driftstore").toString
    val (bStore, tStore) = (s"$dir/buckets", s"$dir/tokens")

    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("text", "source").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Drift.foldIntoStore(bStore,
          Drift.bucketCounts(batch, "source", "text"), Seq("source", "b"), "cnt")
        Drift.foldIntoStore(tStore,
          Drift.tokenCounts(batch, "source", "text"), Seq("source", "w"), "c")
        ()
      }.start()

    val batches = Seq(
      (1 to 15).map(i => (s"web text common alpha beta $i", "a")) ++
        (1 to 10).map(i => (s"spamword spamword web $i", "c")),
      (1 to 15).map(i => (s"web text common alpha gamma $i", "b")) ++
        (1 to 10).map(i => (s"spamword spamword spamword $i", "c")),
      (1 to 5).map(i => (s"web text common beta gamma $i", "a")))
    try {
      batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = Drift.cardFromCounts(
        spark.read.parquet(bStore), spark.read.parquet(tStore))
      .collect().map(_.toString).toSeq
    val oneShot = Drift.sourceDrift(
        batches.flatten.toDF("text", "source"), "source", "text")
      .collect().map(_.toString).toSeq
    assert(streamed == oneShot)

    // boundedness: the bucket store is grid-capped, not stream-sized
    assert(spark.read.parquet(bStore).count() <= 3L * 4096)
  }
}
