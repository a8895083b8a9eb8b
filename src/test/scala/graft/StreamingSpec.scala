package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming variants (SURVEY §2.6 E4): watermarked
  * tumbling window and stateful sessionization, driven through
  * MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(3600L * 1000 + min * 60000L)

  test("tumblingHourlyStreaming aggregates windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingHourlyStreaming(df, watermark = "0 seconds")
      .writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far past hour 1 so the first window closes
      mem.addData((ts(600), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("tumble")
        .select("event_type", "n", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("slidingWindowStreaming: events land in 4 overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.slidingWindowStreaming(df, watermark = "0 seconds")
      .writeStream.format("memory").queryName("slide")
      .outputMode("append").start()
    try {
      mem.addData((ts(30), "click", 2.0))
      q.processAllAvailable()
      mem.addData((ts(600), "view", 1.0)) // advance watermark, close windows
      q.processAllAvailable()
      val rows = spark.table("slide").select("ws", "n", "sum_value")
        .as[(Timestamp, Long, Double)].collect()
      // one event → exactly 4 closed hourly windows stepped 15 min
      assert(rows.count(_._2 == 1L) >= 4)
      val clickWs = rows.filter(_._3 == 2.0).map(_._1.getTime).sorted
      assert(clickWs.length == 4, s"expected 4 windows, got ${clickWs.toSeq}")
      assert(clickWs.sliding(2).forall { case Array(a, b) => b - a == 15 * 60000L },
        "windows must be stepped by 15 minutes")
    } finally q.stop()
  }

  test("sessionizeStreaming emits sessions on gap expiry across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val out = EventStreams.sessionizeStreaming(mem.toDS(), gapMs = 1000,
        useTimeout = false)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: one burst for user 1 (stays open in state)
      mem.addData(EventStreams.Ev(1L, 1000000L), EventStreams.Ev(1L, 1500000L))
      out.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      // batch 2: an event past the gap closes the first session
      mem.addData(EventStreams.Ev(1L, 999000000L))
      out.processAllAvailable()
      val sessions = spark.table("sessions").as[EventStreams.SessionOut].collect()
      assert(sessions.length == 1)
      assert(sessions.head.n == 2 && sessions.head.startMicros == 1000000L)
    } finally out.stop()
  }

  test("dedupStreaming drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_id", "value")
    val q = EventStreams.dedupStreaming(df, "event_id", watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), 1L, 1.0), (ts(1), 1L, 2.0), (ts(2), 2L, 3.0))
      q.processAllAvailable()
      mem.addData((ts(3), 1L, 4.0)) // still within watermark → dropped
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(rows == Seq(1L, 2L))
    } finally q.stop()
  }

  test("enrichStreaming decorates a stream with a static dim per batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.enrichStreaming(df, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), 1L), (ts(1), 2L), (ts(2), 3L)) // 3L: no dim row
      q.processAllAvailable()
      val rows = spark.table("enriched").select("user_id", "tier")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "gold"), (2L, "basic"))) // inner join drops 3L
    } finally q.stop()
  }

  test("intervalJoinStreaming matches right events within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Timestamp, Long, String)]
    val rMem = MemoryStream[(Timestamp, Long, String)]
    val l = lMem.toDF().toDF("ts", "k", "l_tag")
    val r = rMem.toDF().toDF("rts", "k", "r_tag")
    val q = EventStreams.intervalJoinStreaming(l, r, "k", withinMs = 120000L,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      lMem.addData((ts(10), 1L, "imp"))
      rMem.addData((ts(11), 1L, "click-in"),   // 1 min after: in window
        (ts(20), 1L, "click-late"),            // 10 min after: out
        (ts(11), 2L, "other-key"))             // wrong key
      q.processAllAvailable()
      val rows = spark.table("ivj").select("l_tag", "r_tag")
        .as[(String, String)].collect().toSet
      assert(rows == Set(("imp", "click-in")))
    } finally q.stop()
  }

  test("batch and streaming tumbling agg agree on the same data") {
    val batch = Seq(
      (ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(61), "view", 5.0))
      .toDF("ts", "event_type", "value")
    val fromBatch = EventStreams.tumblingHourly(batch)
      .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect().toSet
    assert(fromBatch == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }
}
