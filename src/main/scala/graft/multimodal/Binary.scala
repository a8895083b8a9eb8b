package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.7): media as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction /
  * frame-sampling as batched per-partition transforms.
  *
  * The actual codecs (image/audio/video decode) are STUBBED with a
  * deterministic fake — this container has no media libraries — but the
  * Spark-side contract is real: schema, per-partition batching, and
  * the UDF signature match what a production decode (e.g. over Arrow
  * batches) would use.
  */
object Binary {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap any string column as an opaque media column with metadata —
    * the ingestion shape for multimodal corpora. */
  def asOpaque(df: DataFrame, idCol: String, payloadCol: String,
               mime: String = "application/octet-stream"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(lit(mime).as("mime"),
        octet_length(col(payloadCol)).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: a real implementation would decode the codec here
    * (per-partition, reusing a decoder instance). The fake produces a
    * deterministic 8-dim feature from the byte content so downstream
    * plumbing (schema, batching, joins) is fully testable. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    // ??? — real codec goes here; deterministic fake below
    val h = bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xFF).toInt / 255.0f))
  }

  /** Batched feature extraction over the opaque column: one decoder
    * pass per partition (mapPartitions, not per-row UDF). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would happen once per partition here
        it.map { case (id, bytes) => (id, fakeDecode(bytes)) }
      }
      .toDF("media_id", "features")
    media.join(out, "media_id")
  }

  /** Frame sampling: split the payload into `n` equal byte ranges
    * ("frames") and emit one row per sampled frame — the partitioning
    * shape of video frame extraction. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val span = math.max(1, bytes.length / n)
        (0 until math.min(n, bytes.length)).iterator.map { i =>
          val chunk = bytes.slice(i * span, math.min((i + 1) * span, bytes.length))
          (id, i, fakeDecode(chunk))
        }
      }
      .toDF("media_id", "frame_no", "features")
  }
}
