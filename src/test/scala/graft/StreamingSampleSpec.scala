package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Sampling

/** The A-ES priority sample's mergeability, run as the streaming
  * ingest loop it enables: foreachBatch keeps a k-row parquet
  * "priority index" — each micro-batch is sampled and merged with the
  * persisted index via one more weightedSample call (keys are
  * hash-deterministic, so they need not be stored). The invariant
  * under test: after any number of batches the index EQUALS the
  * batch-mode sample of everything seen — i.e. streaming ingest never
  * has to resample the corpus. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  test("incrementally-merged k-row index equals the batch sample of all data") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("prio_idx").toFile.getAbsolutePath
    val idxPath = s"$dir/index"
    val k = 25; val salt = 11L

    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "w")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        // distinct() makes the merge replay-safe: foreachBatch is
        // at-least-once, and a replayed row is bit-identical (same id,
        // same weight, same deterministic key), so without it a replay
        // could fill the top-k with duplicates of one hot doc
        val merged =
          if (new java.io.File(idxPath).exists())
            Sampling.weightedSample(
              ss.read.parquet(idxPath).unionAll(batch).distinct(),
              "id", "w", k, salt)
          else Sampling.weightedSample(batch.distinct(), "id", "w", k, salt)
        // k rows: write to a fresh dir then swap would be the
        // production move; overwrite is fine for the spec
        val rows = merged.collect()
        ss.createDataFrame(ss.sparkContext.parallelize(rows.toSeq), merged.schema)
          .write.mode("overwrite").parquet(idxPath)
        ()
      }
      .start()
    val all = (1L to 600L).map(i => (i, 1.0 + (i % 17)))
    try {
      all.grouped(150).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
        // replay the chunk (at-least-once delivery): the merged index
        // must be unaffected — same ids, same deterministic keys
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(idxPath)
      .select("id").as[Long].collect().toSet
    val batchMode = Sampling.weightedSample(
        all.toDF("id", "w"), "id", "w", k, salt)
      .select("id").as[Long].collect().toSet
    assert(streamed === batchMode)
    assert(streamed.size === k)
  }
}
