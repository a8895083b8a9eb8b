package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.7): media as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction /
  * frame-sampling as batched per-partition transforms.
  *
  * Codecs plug in behind the [[MediaCodec]] seam: the default used by
  * the catalog queries is a deterministic fake (hash-derived features,
  * reproducible anywhere), and [[ImageIoCodec]] is a real pure-JVM
  * javax.imageio decoder (PNG/BMP/GIF — pixel-math-verified in
  * MultimodalSpec) behind the same interface. The Spark-side contract
  * is identical either way: schema, per-partition batching, and the
  * open-once-per-task decoder lifecycle a production native decoder
  * (e.g. over Arrow batches) would use.
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

  /** Per-partition decoder lifecycle: open once, close on task
    * completion (JNI/native decoders are expensive to construct). */
  private def withDecoder(codec: MediaCodec): MediaCodec.Decoder = {
    val dec = codec.open()
    org.apache.spark.TaskContext.get() match {
      case null => () // driver-local (tests): GC'd, close() is a no-op path
      case tc => tc.addTaskCompletionListener[Unit](_ => dec.close())
    }
    dec
  }

  /** Batched feature extraction over the opaque column: one decoder
    * instance per partition (mapPartitions, not per-row UDF), codec
    * pluggable via `MediaCodec`. */
  def extractFeatures(media: DataFrame,
                      codec: MediaCodec = FakeHashCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = withDecoder(codec)
        it.map { case (id, bytes) => (id, dec.decode(bytes)) }
      }
      .toDF("media_id", "features")
    media.join(out, "media_id")
  }

  /** Frame sampling: split the payload into `n` equal byte ranges
    * ("frames") and emit one row per sampled frame — the partitioning
    * shape of video frame extraction. A real video codec would seek
    * keyframes instead of byte ranges; the row shape is identical. */
  def sampleFrames(media: DataFrame, n: Int,
                   codec: MediaCodec = FakeHashCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = withDecoder(codec)
        it.flatMap { case (id, bytes) =>
          val span = math.max(1, bytes.length / n)
          (0 until math.min(n, bytes.length)).iterator.map { i =>
            val chunk = bytes.slice(i * span, math.min((i + 1) * span, bytes.length))
            (id, i, dec.decode(chunk))
          }
        }
      }
      .toDF("media_id", "frame_no", "features")
  }
}
