package graft

import java.nio.file.{Files, Path}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions._
import graft.sources.KittiSources
import graft.operators.{Analysis, CutOut}

/** KITTI-format readers against generated fixture files (the real
  * KITTI layout: velodyne/NNNNNN.bin, label_2/NNNNNN.txt,
  * calib/NNNNNN.txt). Expected values hand-computed from the reference
  * algorithms (data_utils.py). */
class KittiSourcesSpec extends SparkSpec {

  private def writeBin(p: Path, pts: Seq[(Float, Float, Float, Float)]): Unit = {
    val bb = ByteBuffer.allocate(pts.size * 16).order(ByteOrder.LITTLE_ENDIAN)
    pts.foreach { case (x, y, z, i) => bb.putFloat(x); bb.putFloat(y); bb.putFloat(z); bb.putFloat(i) }
    Files.write(p, bb.array())
  }

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("kitti")
    val velo = Files.createDirectories(dir.resolve("velodyne"))
    val lbl = Files.createDirectories(dir.resolve("label_2"))
    val cal = Files.createDirectories(dir.resolve("calib"))
    writeBin(velo.resolve("000000.bin"),
      Seq((1f, 2f, 3f, 0.5f), (4f, 5f, 6f, 0.9f)))
    writeBin(velo.resolve("000001.bin"), Seq((0f, 0f, 0f, 0.1f)))
    Files.writeString(lbl.resolve("000000.txt"),
      "Car 0.0 0 1.5 100 200 300 400 1.5 1.6 3.2 2.0 1.0 10.0 0.5\n" +
      "DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10\n")
    Files.writeString(lbl.resolve("000001.txt"),
      "Pedestrian 0.1 1 0.2 10 20 30 40 1.8 0.6 0.8 5.0 1.2 8.0 -0.3\n")
    // identity-ish calib: Tr = identity 3x4 with translation (1,2,3); R0 = identity
    val calText =
      "P2: 1 0 0 0 0 1 0 0 0 0 1 0\n" +
      "R0_rect: 1 0 0 0 1 0 0 0 1\n" +
      "Tr_velo_to_cam: 1 0 0 1 0 1 0 2 0 0 1 3\n"
    Files.writeString(cal.resolve("000000.txt"), calText)
    Files.writeString(cal.resolve("000001.txt"), calText)
    dir
  }

  test("pointClouds parses float32 quads per frame, in file order") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    assert(pts.count() == 3)
    val f0 = pts.filter(col("frame_id") === 0).orderBy("pt_idx")
      .select("pt_idx", "x", "y", "z", "intensity")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(f0.toSeq == Seq((0L, 1.0, 2.0, 3.0, 0.5f.toDouble), (1L, 4.0, 5.0, 6.0, 0.9f.toDouble)))
  }

  test("writePointClouds round-trips .bin files byte-identically") {
    val in = root.resolve("velodyne").toString
    val outDir = Files.createTempDirectory("kitti-out")
    KittiSources.writePointClouds(KittiSources.pointClouds(spark, in), outDir.toString)
    for (f <- Seq("000000.bin", "000001.bin")) {
      val orig = Files.readAllBytes(root.resolve("velodyne").resolve(f))
      val got = Files.readAllBytes(outDir.resolve(f))
      assert(java.util.Arrays.equals(orig, got), s"$f bytes differ")
    }
    // and the re-read DataFrame is value-identical to the original read
    val a = KittiSources.pointClouds(spark, in)
    val b = KittiSources.pointClouds(spark, outDir.toString)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("writePointClouds writes empty placeholder .bin for all-filtered frames") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    val out = Files.createTempDirectory("kitti-empty")
    // box keeps frame-0 points only: frame 1 (origin + T = (1,2,3),
    // remapped (1,3,-2)) falls outside x > 1.5
    val stats = CutOut.genCutOutDataset(pts, cal,
      (1.5, 1.5, -10.0), (10.0, 10.0, 10.0), out.toString, format = "bin").head()
    // the reference writes an EMPTY .bin for the cut-away frame and
    // counts it as 0 in the stats (data_pipeline.py:80-84)
    assert(Files.exists(out.resolve("000001.bin")), "placeholder file missing")
    assert(Files.size(out.resolve("000001.bin")) == 0L)
    assert(Files.size(out.resolve("000000.bin")) == 32L)
    assert(stats.getAs[Long]("n_frames") == 2L)
    assert(stats.getAs[Long]("min_pts") == 0L)
    assert(stats.getAs[Long]("max_pts") == 2L)
    assert(stats.getAs[Double]("avg_pts") == 1.0)
    // commit protocol leaves no temp files behind
    val leftovers = Files.list(out).iterator()
    val tmps = Iterator.continually(leftovers)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.endsWith(".tmp")).toSeq
    assert(tmps.isEmpty, s"stranded temp files: $tmps")
  }

  test("genCutOutDataset format=bin writes KITTI-readable cut-outs") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    val out = Files.createTempDirectory("kitti-cut").toString
    val stats = CutOut.genCutOutDataset(pts, cal,
      (-10.0, -10.0, -10.0), (10.0, 10.0, 10.0), out, format = "bin").head()
    val reread = KittiSources.pointClouds(spark, out)
    assert(reread.count() == stats.getAs[Long]("min_pts") + stats.getAs[Long]("max_pts"))
    // calibrated frame-0 point (1,2,3)+T=(2,4,6) remapped → (2,6,-4)
    val p = reread.filter(col("frame_id") === 0 && col("pt_idx") === 0).head()
    assert(p.getAs[Double]("x") == 2.0 && p.getAs[Double]("y") == 6.0
      && p.getAs[Double]("z") == -4.0)
  }

  test("labels parses 15-field rows with frame ids") {
    val lbl = KittiSources.labels(spark, root.resolve("label_2").toString)
    assert(lbl.count() == 3)
    val car = lbl.filter(col("cls") === "Car").head()
    assert(car.getAs[Long]("frame_id") == 0L)
    assert(car.getAs[Double]("dim_h") == 1.5)
    assert(car.getAs[Double]("dim_w") == 1.6)
    assert(car.getAs[Double]("dim_l") == 3.2)
    assert(car.getAs[Double]("loc_z") == 10.0)
    assert(car.getAs[Double]("rotation_y") == 0.5)
  }

  test("calibrations parses matrices as arrays") {
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    assert(cal.count() == 2)
    val r = cal.filter(col("frame_id") === 0).head()
    assert(r.getAs[scala.collection.Seq[Double]]("p2").toSeq == Seq(1.0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0))
    assert(r.getAs[scala.collection.Seq[Double]]("r0_rect").toSeq == Seq(1.0, 0, 0, 0, 1, 0, 0, 0, 1))
    assert(r.getAs[scala.collection.Seq[Double]]("tr_velo_to_cam").toSeq.takeRight(1) == Seq(3.0))
  }

  test("alignFrames joins the three sources on frame_id") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val lbl = KittiSources.labels(spark, root.resolve("label_2").toString)
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    // points x labels is a per-frame cross: frame0 2pts x 2lbls + frame1 1x1
    assert(KittiSources.alignFrames(pts, lbl, cal).count() == 5)
  }

  test("calibratePoints applies Tr, R0 and axis remap") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    val out = Analysis.calibratePoints(pts.join(cal, "frame_id"))
    // point (1,2,3) + translation (1,2,3) = cam (2,4,6); remap → (2, 6, -4)
    val p = out.filter(col("frame_id") === 0 && col("intensity") === 0.5).head()
    assert(p.getAs[Double]("x") == 2.0)
    assert(p.getAs[Double]("y") == 6.0)
    assert(p.getAs[Double]("z") == -4.0)
  }

  test("cutOut + pointStats mirror gen_cut_out_dataset") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val in = CutOut.cutOut(pts, (0.5, 1.5, 2.5), (10.0, 10.0, 10.0))
    assert(in.count() == 2) // both frame-0 points pass, frame-1 origin fails
    val stats = CutOut.pointStats(in).head()
    assert(stats.getAs[Long]("min_pts") == 2L)
    assert(stats.getAs[Long]("n_frames") == 1L)
  }

  test("labelCornerExtents excludes DontCare and spans rotated corners") {
    val lbl = KittiSources.labels(spark, root.resolve("label_2").toString)
    val e = Analysis.labelCornerExtents(lbl).head()
    // DontCare (-1000 locations) must not poison the extents
    assert(e.getAs[Double]("min_cx") > -100.0)
    assert(e.getAs[Double]("max_cx") > e.getAs[Double]("min_cx"))
  }

  test("zNormalize subtracts per-frame percentile") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val norm = Analysis.zNormalize(pts, "frame_id", "z", p = 0.0) // min
    val zs = norm.filter(col("frame_id") === 0).select("z")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(zs == Seq(0.0, 3.0)) // z={3,6} minus min 3
  }
}
