package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams

/** Built-in session_window sessionization: batch/streaming agreement
  * and the end-exclusive boundary rule (e9's semantics). */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(3600L * 1000 + min * 60000L)

  // user 1: two sessions split by a 40-min gap; user 2: one event;
  // user 3: two events EXACTLY 30 min apart — must MERGE (Spark merges
  // a successor whose start <= the open session's end)
  private def evs: Seq[(Long, Timestamp, Double)] = Seq(
    (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(50), 4.0),
    (2L, ts(5), 8.0),
    (3L, ts(0), 16.0), (3L, ts(30), 32.0))

  test("batch sessionWindows: islands, end = last + gap, exact-gap merges") {
    val got = EventStreams.sessionWindows(
        evs.toDF("user_id", "ts", "value"))
      .orderBy("user_id", "ws")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    val gap = 30 * 60000L
    val expected = Seq(
      (1L, ts(0), new Timestamp(ts(10).getTime + gap), 2L, 3.0),
      (1L, ts(50), new Timestamp(ts(50).getTime + gap), 1L, 4.0),
      (2L, ts(5), new Timestamp(ts(5).getTime + gap), 1L, 8.0),
      (3L, ts(0), new Timestamp(ts(30).getTime + gap), 2L, 48.0))
    assert(got == expected)
  }

  test("sessionStats (session_window) ≡ gaps-and-islands rollup") {
    // e2's r12 delegation to the built-in: per-user (n_sessions,
    // n_events, max_session_events) must equal the lag/cumsum
    // formulation's rollup on a corpus exercising the exact-gap merge
    // and multi-session users. event_id present for sessionize's
    // deterministic tiebreak.
    val df = evs.zipWithIndex
      .map { case ((u, t, v), i) => (u, t, v, i.toLong) }
      .toDF("user_id", "ts", "value", "event_id")
    val got = EventStreams.sessionStats(df)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = EventStreams.sessionize(df)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
        org.apache.spark.sql.functions.sum("n").cast("long").as("n_events"),
        org.apache.spark.sql.functions.max("n").as("max_session_events"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("sessionWindowsStreaming closes the same sessions the batch form builds") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionWindowsStreaming(df, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      // split across micro-batches: the in-gap event must MERGE into
      // user 1's open session in the state store
      mem.addData((1L, ts(0), 1.0), (2L, ts(5), 8.0), (3L, ts(0), 16.0))
      q.processAllAvailable()
      mem.addData((1L, ts(10), 2.0), (1L, ts(50), 4.0), (3L, ts(30), 32.0))
      q.processAllAvailable()
      mem.addData((9L, ts(600), 0.0)) // advance watermark, close everything
      q.processAllAvailable()
      val streamed = spark.table("sesswin")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      val batch = EventStreams.sessionWindows(evs.toDF("user_id", "ts", "value"))
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(batch.subsetOf(streamed),
        s"streaming must close every batch session:\n got $streamed\n want $batch")
    } finally q.stop()
  }
}
