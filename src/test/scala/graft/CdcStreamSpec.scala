package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Cdc
import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Change, Current}

/** Streaming CDC: the mapGroupsWithState current-state view converges
  * to exactly what the batch operator computes over the same
  * changelog, including out-of-order arrivals across micro-batches
  * and delete tombstones. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming latest-state equals batch latestState across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = CdcStream.cdcLatestStreaming(mem.toDS())
      .writeStream.format("memory").queryName("cdc_cur")
      .outputMode("update").start()
    try {
      // batch 1: initial versions
      mem.addData(
        Change(1L, 100L, 1L, "U", 10.0),
        Change(2L, 100L, 2L, "U", 20.0),
        Change(3L, 100L, 3L, "U", 30.0))
      q.processAllAvailable()
      // batch 2: newer update for 1, OUT-OF-ORDER stale update for 2,
      // delete for 3, same-ts seq tie for 1
      mem.addData(
        Change(1L, 200L, 4L, "U", 11.0),
        Change(2L, 50L, 5L, "U", 99.0), // stale: must NOT win
        Change(3L, 300L, 6L, "D", 0.0),
        Change(1L, 200L, 7L, "U", 12.0)) // same ts, higher seq: wins
      q.processAllAvailable()

      // latest update per key from the update-mode log
      val updates = spark.table("cdc_cur").as[Current].collect()
      val current = updates.groupBy(_.key).map { case (k, us) =>
        us.maxBy(u => (u.tsMicros, u.seq))
      }.toSeq
      val live = current.filter(_.op != "D").map(c => c.key -> c.value).toMap
      assert(live == Map(1L -> 12.0, 2L -> 20.0))
      assert(current.exists(c => c.key == 3L && c.op == "D"), "tombstone for 3")

      // and the batch operator over the full changelog agrees
      val all = Seq(
        (1L, new Timestamp(0), 1L, "U", 10.0), (2L, new Timestamp(0), 2L, "U", 20.0),
        (3L, new Timestamp(0), 3L, "U", 30.0), (1L, new Timestamp(1), 4L, "U", 11.0),
        (2L, new Timestamp(-1), 5L, "U", 99.0), (3L, new Timestamp(2), 6L, "D", 0.0),
        (1L, new Timestamp(1), 7L, "U", 12.0)
      ).toDF("key", "ts", "seq", "op", "value")
      val batch = Cdc.latestState(all, "key", "ts", "seq", "op")
        .select($"key", $"value").as[(Long, Double)].collect().toMap
      assert(batch == live)
    } finally q.stop()
  }
}
