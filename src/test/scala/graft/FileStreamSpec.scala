package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.EventStreams

/** Real file-source streaming (SURVEY §2.6 E4): events arriving as
  * parquet files in a watched directory → watermarked tumbling agg →
  * memory sink, checked against the batch run of the same transform. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("readStream over a parquet directory matches the batch aggregate") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def ts(min: Int) = new Timestamp(7200L * 1000 + min * 60000L)
    val batch1 = Seq((ts(0), "click", 1.0), (ts(5), "view", 2.0), (ts(20), "click", 4.0))
    val batch2 = Seq((ts(30), "view", 8.0), (ts(600), "click", 16.0))
    batch1.toDF("ts", "event_type", "value").write.parquet(s"$dir/in/b1")

    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(s"$dir/in/*")
    val q = EventStreams.tumblingHourlyStreaming(stream, watermark = "0 seconds")
      .writeStream.format("memory").queryName("filetumble")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      batch2.toDF("ts", "event_type", "value").write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
      val got = spark.table("filetumble")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSet
      val want = EventStreams.tumblingHourly(
          (batch1 ++ batch2).toDF("ts", "event_type", "value")
            .filter(col("ts") < lit(ts(590)))) // last window not yet closed by watermark
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSet
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }
}
