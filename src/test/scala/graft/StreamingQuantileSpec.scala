package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** Streaming quantile monitor — the use the t34 sketch's mergeability
  * exists for: each micro-batch builds a bucket-count increment and
  * merges it into a persisted store (bounded: ≤ ~2k rows per group,
  * whatever the stream's volume); quantiles read the store at any
  * point. Because merge is exact (`merge(build(A), build(B)) ≡
  * build(A ∪ B)`), the store after N batches must equal the one-shot
  * batch sketch of all rows — including the quantile estimates. KLL /
  * t-digest can't make that promise: their compactions are
  * merge-order-dependent, so a streaming fold drifts from the batch
  * answer. */
class StreamingQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch merge-into-store equals the one-shot batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("qstore").toString + "/sketch"

    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("g", "v")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val inc = QuantileSketch.build(batch, Seq("g"), "v")
        val merged =
          if (new java.io.File(store).exists())
            QuantileSketch.merge(
              batch.sparkSession.read.parquet(store), inc, Seq("g"))
          else inc
        // the store is sketch-sized (bounded); checkpoint breaks the
        // read-overwrite cycle on the same path
        merged.localCheckpoint(true)
          .write.mode("overwrite").parquet(store)
        ()
      }
      .start()

    val rnd = new scala.util.Random(5)
    val batches = (1 to 3).map { b =>
      (1 to 2000).map(i => (s"g${i % 3}", rnd.nextInt(1 << (8 + b)).toLong))
    }
    try {
      batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    } finally q.stop()

    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val streamed = QuantileSketch.quantiles(
        spark.read.parquet(store), Seq("g"), qs)
      .orderBy("g").collect().map(_.toSeq).toSeq
    val oneShot = QuantileSketch.groupQuantiles(
        batches.flatten.toDF("g", "v"), Seq("g"), "v", qs)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(streamed == oneShot)

    // and the store itself is the batch sketch row-for-row
    val storeRows = spark.read.parquet(store)
      .orderBy("g", "__bucket").collect().map(_.toSeq).toSeq
    val batchRows = QuantileSketch.build(
        batches.flatten.toDF("g", "v"), Seq("g"), "v")
      .orderBy("g", "__bucket").collect().map(_.toSeq).toSeq
    assert(storeRows == batchRows)

    // boundedness: the store stays sketch-sized, not stream-sized
    assert(spark.read.parquet(store).count() <=
      3L * 62 * 32, "store exceeded the bucket-count cap")
  }
}
