package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image TRANSFORMS over the opaque binary column (SURVEY §2.7) —
  * completes the brief's decode / feature-extract / resize /
  * frame-sample quartet with the one that re-ENCODES: resize.
  *
  * Resampling is explicit NEAREST-NEIGHBOR with integer source
  * indexing — sx = ⌊x·srcW/dstW⌋ — rather than Graphics2D
  * interpolation: AWT's scaling hints are implementation-defined
  * (platform/JDK-dependent rounding), and a corpus transform must be
  * bit-reproducible across reruns and cluster JVMs. Pixel mapping is
  * therefore exact integer arithmetic; only the PNG container bytes
  * are JDK-encoder-defined (tests assert decoded PIXELS, not bytes).
  *
  * Same per-partition batching and quarantine convention as
  * `Binary.extractFeatures`: one decode context per partition,
  * undecodable payloads → null output payload (filter
  * `media IS NULL` into a quarantine; a poison row must not kill the
  * partition).
  */
object ImageOps {

  /** Resize every payload to `w`×`h` and re-encode as PNG. Input
    * needs (media_id, media); output (media_id, media, meta) with
    * meta = (mime, n_bytes), media null when the input bytes don't
    * decode. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        it.map { case (id, bytes) => (id, resizeOne(bytes, w, h)) }
      }
      .toDF("media_id", "media")
      .select(col("media_id"), col("media"),
        struct(lit("image/png").as("mime"),
          coalesce(octet_length(col("media")).cast("long"), lit(0L))
            .as("n_bytes")).as("meta"))
  }

  /** Deterministic synthetic RGB corpus: one `w`×`h` PNG per input
    * `media_id`, channel values from pure integer (id, x, y)
    * arithmetic — r = (7·id + 11·x + 13·y) mod 256, g = (5·id + 3·x +
    * 7·y) mod 256, b = (3·id + 5·x + y) mod 256. PNG is lossless, so
    * every downstream decode sees exactly these pixels; an oracle can
    * replay them in SQL without touching the container bytes. This is
    * the generator for REAL-codec evidence (m5_image_pipeline), not a
    * production operator. */
  def synthesize(ids: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("media_id").cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        it.map(id => (id, synthOne(id, w, h)))
      }
      .toDF("media_id", "media")
  }

  private[multimodal] def synthOne(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (((7 * id + 11 * x + 13 * y) % 256) + 256) % 256
        val g = (((5 * id + 3 * x + 7 * y) % 256) + 256) % 256
        val b = (((3 * id + 5 * x + y) % 256) + 256) % 256
        img.setRGB(x, y, ((r.toInt << 16) | (g.toInt << 8) | b.toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[multimodal] def resizeOne(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val sw = img.getWidth
    val sh = img.getHeight
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * sh / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * sw / w).toInt
        out.setRGB(x, y, img.getRGB(sx, sy) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}
