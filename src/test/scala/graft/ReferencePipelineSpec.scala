package graft

import java.nio.file.{Files, Path}
import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.KittiSources
import graft.operators.{Analysis, CutOut}

/** The reference's two top-level entry points (`get_analysis`,
  * `gen_cut_out_dataset`) as one-call operators over a KITTI fixture
  * corpus — the "switching user" surface. */
class ReferencePipelineSpec extends SparkSpec {

  private def writeBin(p: Path, pts: Seq[(Float, Float, Float, Float)]): Unit = {
    val bb = ByteBuffer.allocate(pts.size * 16).order(ByteOrder.LITTLE_ENDIAN)
    pts.foreach { case (x, y, z, i) => bb.putFloat(x); bb.putFloat(y); bb.putFloat(z); bb.putFloat(i) }
    Files.write(p, bb.array())
  }

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("kitti-ref")
    val velo = Files.createDirectories(dir.resolve("velodyne"))
    val lbl = Files.createDirectories(dir.resolve("label_2"))
    val cal = Files.createDirectories(dir.resolve("calib"))
    val rnd = new scala.util.Random(3)
    for (f <- 0 until 2) {
      writeBin(velo.resolve(f"$f%06d.bin"), Seq.fill(300)(
        (rnd.nextFloat() * 40 - 20, rnd.nextFloat() * 40 - 20,
          rnd.nextFloat() * 5 - 2, rnd.nextFloat())))
      Files.writeString(lbl.resolve(f"$f%06d.txt"),
        s"Car 0.0 0 1.5 100 200 300 400 1.5 1.6 3.2 ${f + 1}.0 1.0 10.0 0.5\n" +
          "DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10\n")
      Files.writeString(cal.resolve(f"$f%06d.txt"),
        "P2: 1 0 0 0 0 1 0 0 0 0 1 0\nR0_rect: 1 0 0 0 1 0 0 0 1\n" +
          "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    }
    dir
  }

  /** Exact-parity fixture: 2 frames, identity calibration (velo =
    * camera coords), axis-aligned labels, one DontCare. Expected
    * numbers hand-derived from data_pipeline.py's formulas and
    * cross-checked against the reference implementation run on the
    * same files:
    *
    *   frame 0: points (1,-2,3), (5,-6,7) → remapped (x, z, -y) =
    *     (1,3,2), (5,7,6); z_scale = 2 + 0.05·(6−2) = 2.2.
    *     Car dims (h,w,l) = (2,1,4), loc (10,1,20), ry = 0 → remapped
    *     corners x∈[8,12], y∈[19.5,20.5], z∈{−1,1}−2.2 = [−3.2,−1.2].
    *   frame 1: points (0,0,10), (4,-8,30) → (0,10,0), (4,30,8);
    *     z_scale = 0.4. Pedestrian dims (1,1,1), loc (−2,0,8) →
    *     corners x∈[−2.5,−1.5], y∈[7.5,8.5], z∈{0,1}−0.4 = [−0.4,0.6].
    *
    *   min_point (0,3,−0.4), max_point (5,30,7.6);
    *   min_obj_corner (−2.5,7.5,−3.2), max_obj_corner (12,20.5,0.6);
    *   loc extents remapped (x, z−z_scale, +y): min (−2,7.6,0),
    *   max (10,17.8,1); max_dim (l,w,h) = (4,1,2).
    *   ⇒ minimal area (0,7.5,−0.4) → (5,18.8,0.6)
    *     maximal area (0,6.6,−0.4) → (5,20.5,3.0)   (2 dp) */
  private lazy val parityRoot: Path = {
    val dir = Files.createTempDirectory("kitti-parity")
    val velo = Files.createDirectories(dir.resolve("velodyne"))
    val lbl = Files.createDirectories(dir.resolve("label_2"))
    val cal = Files.createDirectories(dir.resolve("calib"))
    writeBin(velo.resolve("000000.bin"),
      Seq((1f, -2f, 3f, 0.5f), (5f, -6f, 7f, 0.5f)))
    writeBin(velo.resolve("000001.bin"),
      Seq((0f, 0f, 10f, 0.5f), (4f, -8f, 30f, 0.5f)))
    Files.writeString(lbl.resolve("000000.txt"),
      "Car 0.0 0 0.0 0 0 0 0 2.0 1.0 4.0 10.0 1.0 20.0 0.0\n" +
        "DontCare -1 -1 -10 0 0 0 0 9 9 9 100 100 100 0\n")
    Files.writeString(lbl.resolve("000001.txt"),
      "Pedestrian 0.0 0 0.0 0 0 0 0 1.0 1.0 1.0 -2.0 0.0 8.0 0.0\n")
    val calTxt = "P2: 1 0 0 0 0 1 0 0 0 0 1 0\nR0_rect: 1 0 0 0 1 0 0 0 1\n" +
      "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    Files.writeString(cal.resolve("000000.txt"), calTxt)
    Files.writeString(cal.resolve("000001.txt"), calTxt)
    dir
  }

  test("referenceAnalysis matches get_analysis bit-for-bit on the parity fixture") {
    val pts = KittiSources.pointClouds(spark, parityRoot.resolve("velodyne").toString)
    val lbl = KittiSources.labels(spark, parityRoot.resolve("label_2").toString)
    val cal = KittiSources.calibrations(spark, parityRoot.resolve("calib").toString)
    val b = Analysis.referenceAnalysis(pts, lbl, cal)
    assert(b.minimal._1 == Seq(0.0, 7.5, -0.4), s"minimal lo ${b.minimal._1}")
    assert(b.minimal._2 == Seq(5.0, 18.8, 0.6), s"minimal hi ${b.minimal._2}")
    assert(b.maximal._1 == Seq(0.0, 6.6, -0.4), s"maximal lo ${b.maximal._1}")
    assert(b.maximal._2 == Seq(5.0, 20.5, 3.0), s"maximal hi ${b.maximal._2}")
  }

  test("referenceAnalysis derives minimal/maximal areas like get_analysis") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val lbl = KittiSources.labels(spark, root.resolve("label_2").toString)
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    val b = Analysis.referenceAnalysis(pts, lbl, cal)
    assert(b.minimal._1.size == 3 && b.minimal._2.size == 3)
    // minimal area is contained in the maximal area on every axis
    (0 until 3).foreach { i =>
      assert(b.minimal._1(i) >= b.maximal._1(i) - 1e-9, s"lo axis $i")
      assert(b.minimal._2(i) <= b.maximal._2(i) + 1e-9, s"hi axis $i")
    }
    // (note: the reference's minimal-area formula can produce an empty
    // interval (lo > hi) when labels lie outside the point span on an
    // axis — it makes no containment guarantee, so neither do we)
    (b.minimal._1 ++ b.minimal._2 ++ b.maximal._1 ++ b.maximal._2)
      .foreach(v => assert(!v.isNaN && !v.isInfinite))
  }

  test("genCutOutDataset filters, exports and reports stats in one call") {
    val pts = KittiSources.pointClouds(spark, root.resolve("velodyne").toString)
    val cal = KittiSources.calibrations(spark, root.resolve("calib").toString)
    val out = root.resolve("cutout").toString
    val stats = CutOut.genCutOutDataset(pts, cal,
      (-10.0, -10.0, -10.0), (10.0, 10.0, 10.0), out).head()
    assert(stats.getAs[Long]("n_frames") == 2L)
    assert(stats.getAs[Long]("min_pts") > 0L)
    val reread = spark.read.parquet(out)
    assert(reread.select("frame_id").distinct().count() == 2)
    assert(reread.count() == stats.getAs[Long]("min_pts") +
      (stats.getAs[Long]("max_pts")))
  }

  test("densityPatches implements the data_pipeline.py:96-99 band sketch") {
    import spark.implicits._
    // unit box [-1,1]^3 -> band_d is the Chebyshev distance itself.
    // Hand-placed points: center (d=0, dense_1 only), d=0.15 (dense_1
    // + dense_2 overlap), d=0.42 (medium_1 + medium_2 overlap),
    // d=0.7 (least_1 + least_2 overlap), d=0.99 (least_2 only),
    // d=1.2 (outside every band)
    val pts = Seq(
      (1L, 0.0, 0.0, 0.0), (2L, 0.15, 0.1, 0.0), (3L, 0.42, 0.0, 0.3),
      (4L, 0.0, 0.7, 0.2), (5L, 0.99, 0.5, 0.5), (6L, 1.2, 0.0, 0.0)
    ).toDF("frame_id", "x", "y", "z")
    val got = CutOut.densityPatches(pts, (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
      .select($"frame_id", $"patch").as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "dense_1"), (2L, "dense_1"), (2L, "dense_2"),
      (3L, "medium_1"), (3L, "medium_2"),
      (4L, "least_1"), (4L, "least_2"), (5L, "least_2")))
    // band table matches the reference sketch: widths 1/6, 1/6, 1/5,
    // 1/5, 1/4, 1/3 and the staggered starts of the comment
    val widths = CutOut.densityBands.map { case (_, lo, hi) => hi - lo }
    val want = Seq(1.0 / 6, 13.0 / 42 - 1.0 / 7, 0.2, 0.2, 0.25, 1.0 / 3)
    widths.zip(want).foreach { case (w, e) => assert(math.abs(w - e) < 1e-12) }
  }
}
