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
}
