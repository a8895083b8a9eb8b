package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KITTI file-format sources, Spark-first.
  *
  * The reference walks directories on the driver and loads each frame
  * with NumPy (data_utils.py:4-56); here each format is a distributed
  * read: `binaryFile` for pointclouds, line/wholetext text sources for
  * labels and calibration, with `frame_id` recovered from file names.
  * Everything downstream is per-row columnar, so a 100 TB corpus
  * parallelizes per file without driver involvement.
  */
object KittiSources {

  private def frameId(pathCol: org.apache.spark.sql.Column) =
    regexp_extract(pathCol, "([0-9]+)\\.[a-z]+$", 1).cast("long").as("frame_id")

  /** Point clouds from KITTI velodyne `.bin` files (float32 x,y,z,
    * intensity quads, little-endian — data_utils.py:11).
    * One input row per file → flatMap to points. `pt_idx` is the
    * point's position within its file: KITTI point order is meaningful
    * (the reference keeps it through masking), and it makes the .bin
    * re-export (`writePointClouds`) byte-round-trippable. */
  def pointClouds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
      .select(frameId(col("path")), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, bytes) =>
        val fb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
        val n = fb.capacity() / 4
        Iterator.tabulate(n) { i =>
          (fid, i.toLong, fb.get(4 * i).toDouble, fb.get(4 * i + 1).toDouble,
            fb.get(4 * i + 2).toDouble, fb.get(4 * i + 3).toDouble)
        }
      }
      .toDF("frame_id", "pt_idx", "x", "y", "z", "intensity")
  }

  /** Raw KITTI `.bin` re-export — the reference's `pocl.tofile(...)`
    * (data_pipeline.py:81): per frame, one `NNNNNN.bin` of
    * little-endian float32 (x, y, z, intensity) quads, point order by
    * `orderCol` (the reader's `pt_idx` round-trips byte-identically —
    * KittiSourcesSpec). Distributed sink: rows are shuffled once so a
    * frame's points land in one task, then streamed to the target
    * FileSystem (local/HDFS/S3 via the Hadoop FS API) — no driver
    * loop, no per-frame job.
    *
    * `frames` (a 1-column frame-id DataFrame, e.g. the pre-filter
    * frame list) makes every listed frame produce a file even when all
    * its points were filtered out — the reference writes an EMPTY .bin
    * for such frames, and KITTI tooling that indexes by directory
    * listing expects them. Without it, all-filtered frames write
    * nothing.
    *
    * Task-commit protocol: each frame streams to an attempt-scoped
    * dot-temp (`.NNNNNN.bin.<attempt>.tmp`) and is renamed onto its
    * final name only after a clean close, so a failed or speculative
    * task attempt can never leave a torn final file — the last
    * finished attempt wins with identical bytes (the sort makes frame
    * content deterministic). Stranded `.tmp`s from killed attempts are
    * dot-prefixed and invisible to `*.bin` globs. */
  def writePointClouds(points: DataFrame, dir: String,
                       orderCol: Option[String] = Some("pt_idx"),
                       frames: Option[DataFrame] = None): Unit = {
    val sortCols = col("frame_id") +: orderCol.map(col).toSeq
    val base = points
      .select((col("frame_id") +: orderCol.map(col).toSeq) ++
        Seq(col("x"), col("y"), col("z"), col("intensity")): _*)
      .withColumn("__ph", lit(false))
    // placeholders sort before real rows (nulls first) and write no
    // bytes — they only force file creation for their frame
    val withPh = frames match {
      case Some(f) =>
        val phCols = base.schema.fields.dropRight(1).map { fd =>
          if (fd.name == "frame_id") col("frame_id")
          else lit(null).cast(fd.dataType).as(fd.name)
        }.toSeq
        base.unionByName(
          f.select(col(f.columns.head).cast("long").as("frame_id")).distinct()
            .select(phCols :+ lit(true).as("__ph"): _*))
      case None => base
    }
    withPh
      .repartition(col("frame_id"))
      .sortWithinPartitions(sortCols: _*)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val off = if (orderCol.isDefined) 1 else 0 // x starts after frame_id[, orderCol]
        val conf = new org.apache.hadoop.conf.Configuration()
        val baseDir = new org.apache.hadoop.fs.Path(dir)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var fs: org.apache.hadoop.fs.FileSystem = null
        var cur = Long.MinValue
        var out: java.io.DataOutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        val quad = java.nio.ByteBuffer.allocate(16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def commitFrame(): Unit = if (out != null) {
          out.close(); out = null
          val dst = new org.apache.hadoop.fs.Path(baseDir, f"$cur%06d.bin")
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(tmp, dst))
            throw new java.io.IOException(s"commit rename failed: $tmp -> $dst")
        }
        try {
          rows.foreach { r =>
            val fid = r.getLong(0)
            if (fid != cur) {
              commitFrame()
              if (fs == null) fs = baseDir.getFileSystem(conf)
              tmp = new org.apache.hadoop.fs.Path(baseDir, f".$fid%06d.bin.$attempt.tmp")
              out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
                fs.create(tmp, true)))
              cur = fid
            }
            if (!r.getBoolean(r.size - 1)) { // skip placeholder rows
              quad.clear()
              quad.putFloat(r.getDouble(off + 1).toFloat)
              quad.putFloat(r.getDouble(off + 2).toFloat)
              quad.putFloat(r.getDouble(off + 3).toFloat)
              quad.putFloat(r.getDouble(off + 4).toFloat)
              out.write(quad.array(), 0, 16)
            }
          }
          commitFrame() // normal completion: commit the last open frame
        } finally if (out != null) out.close() // abnormal: leave only the .tmp
      }
  }

  /** Labels from KITTI `label_2` text files (data_utils.py:17): 15
    * whitespace-separated fields per object row. Pure-column parse. */
  def labels(spark: SparkSession, dir: String): DataFrame = {
    val f = split(col("value"), " ")
    spark.read.option("pathGlobFilter", "*.txt").text(dir)
      .select(frameId(input_file_name()), f.as("f"))
      .filter(size(col("f")) >= 15)
      .select(col("frame_id"),
        col("f").getItem(0).as("cls"),
        col("f").getItem(1).cast("double").as("truncated"),
        col("f").getItem(2).cast("int").as("occluded"),
        col("f").getItem(3).cast("double").as("alpha"),
        col("f").getItem(4).cast("double").as("bbox_left"),
        col("f").getItem(5).cast("double").as("bbox_top"),
        col("f").getItem(6).cast("double").as("bbox_right"),
        col("f").getItem(7).cast("double").as("bbox_bottom"),
        col("f").getItem(8).cast("double").as("dim_h"),
        col("f").getItem(9).cast("double").as("dim_w"),
        col("f").getItem(10).cast("double").as("dim_l"),
        col("f").getItem(11).cast("double").as("loc_x"),
        col("f").getItem(12).cast("double").as("loc_y"),
        col("f").getItem(13).cast("double").as("loc_z"),
        col("f").getItem(14).cast("double").as("rotation_y"))
  }

  /** Calibration files (data_utils.py:36): `KEY: v v v ...` lines →
    * one row per frame with matrices as array<double> columns
    * (P2 3x4=12, R0_rect 3x3=9, Tr_velo_to_cam 3x4=12). */
  def calibrations(spark: SparkSession, dir: String): DataFrame = {
    def mat(key: String, n: Int) = {
      val line = regexp_extract(col("value"), key + ":([^\\n\\r]+)", 1)
      val arr = transform(split(trim(line), "\\s+"), x => x.cast("double"))
      when(size(arr) === n, arr).otherwise(lit(null)).as(key.toLowerCase)
    }
    spark.read.option("wholetext", "true").option("pathGlobFilter", "*.txt").text(dir)
      .select(frameId(input_file_name()),
        mat("P2", 12), mat("R0_rect", 9), mat("Tr_velo_to_cam", 12))
  }

  /** Frame alignment (`get_files`, data_utils.py:4): the reference
    * zips three sorted directory listings; here it's an equi-join on
    * the recovered frame_id. */
  def alignFrames(points: DataFrame, labels: DataFrame, calib: DataFrame): DataFrame =
    points.join(labels, "frame_id").join(calib, "frame_id")
}
