package graft

import org.apache.spark.sql.functions._
import graft.functions.Geometry

/** Geometry kernel vs a direct scala re-computation of the reference
  * math (data_utils.py:111-137 `get_3d_bbox`). */
class GeometrySpec extends SparkSpec {
  import spark.implicits._

  /** Test oracle: straight port of the reference's corner math. */
  private def refCorners(h: Double, w: Double, l: Double,
                         x: Double, y: Double, z: Double, ry: Double): Seq[(Double, Double, Double)] = {
    val xc = Seq(-l / 2, l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2)
    val yc = Seq(0.0, 0, 0, 0, -h, -h, -h, -h)
    val zc = Seq(-w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2, w / 2)
    (0 until 8).map { i =>
      val rx = math.cos(ry) * xc(i) + math.sin(ry) * zc(i) + x
      val rz = -math.sin(ry) * xc(i) + math.cos(ry) * zc(i) + z
      val fy = yc(i) + y
      (rx, rz, -fy) // axis remap (x, z, -y)
    }
  }

  test("bbox3dCorners matches the reference corner math") {
    val cases = Seq(
      (1.5, 1.6, 3.2, 2.0, 1.0, 10.0, 0.5),
      (1.8, 0.6, 0.8, 5.0, 1.2, 8.0, -0.3),
      (2.0, 2.0, 2.0, 0.0, 0.0, 0.0, 0.0))
    val df = cases.toDF("h", "w", "l", "x", "y", "z", "ry")
    val got = df.select(inline(Geometry.bbox3dCorners(
        col("h"), col("w"), col("l"), col("x"), col("y"), col("z"), col("ry"))))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = cases.flatMap { case (h, w, l, x, y, z, ry) =>
      refCorners(h, w, l, x, y, z, ry).zipWithIndex.map { case (c, i) => (i, c._1, c._2, c._3) }
    }
    got.zip(want).foreach { case ((gi, gx, gy, gz), (wi, wx, wy, wz)) =>
      assert(gi == wi)
      assert(math.abs(gx - wx) < 1e-12, s"cx corner $gi")
      assert(math.abs(gy - wy) < 1e-12, s"cy corner $gi")
      assert(math.abs(gz - wz) < 1e-12, s"cz corner $gi")
    }
  }

  test("transform3x4 + rotateX90 compose the calibration chain") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("x", "y", "z")
    val m = Seq(1.0, 0, 0, 10, 0, 1, 0, 20, 0, 0, 1, 30)
    val Seq(nx, ny, nz) = Geometry.transform3x4(m, col("x"), col("y"), col("z"))
    val Seq(px, py, pz) = Geometry.rotateX90(nx, ny, nz)
    val r = df.select(px.as("px"), py.as("py"), pz.as("pz")).head()
    assert(r.getDouble(0) == 11.0) // x+10
    assert(r.getDouble(1) == 33.0) // z+30 remapped to y
    assert(r.getDouble(2) == -22.0) // -(y+20)
  }

  test("inBox strict bounds") {
    val df = Seq((1.0, 1.0, 1.0), (0.0, 1.0, 1.0), (2.0, 2.0, 2.0)).toDF("x", "y", "z")
    val n = df.filter(Geometry.inBox(col("x"), col("y"), col("z"),
      (0.5, 0.5, 0.5), (1.5, 1.5, 1.5))).count()
    assert(n == 1)
  }

  test("bboxEdges enumerate the 12 box edges") {
    assert(Geometry.bboxEdges.size == 12)
    assert(Geometry.bboxEdges.flatMap(e => Seq(e._1, e._2)).forall(i => i >= 0 && i < 8))
  }

  test("bboxEdgeSegments connect the right corners") {
    val df = Seq((2.0, 2.0, 2.0, 0.0, 0.0, 0.0, 0.0)).toDF("h", "w", "l", "x", "y", "z", "ry")
    val segs = df.select(inline(Geometry.bboxEdgeSegments(
        col("h"), col("w"), col("l"), col("x"), col("y"), col("z"), col("ry"))))
      .collect()
    assert(segs.length == 12)
    // edge 0 connects corners 0→1: for ry=0 that's along length (x axis)
    val e0 = segs.find(_.getInt(0) == 0).get
    assert(math.abs((e0.getDouble(4) - e0.getDouble(1)) - 2.0) < 1e-12) // Δx = l
    assert(e0.getDouble(5) == e0.getDouble(2)) // Δy = 0
  }

  test("planeCorners spans the rectangle (z flattened)") {
    val c = Geometry.planeCorners((0, 0, 5), (2, 3, 7), zFixed = Some(0.0))
    assert(c == Seq((0.0, 0.0, 0.0), (2.0, 0.0, 0.0), (2.0, 3.0, 0.0), (0.0, 3.0, 0.0)))
  }

  test("zorderKey interleaves quantized bits; clamps out-of-range") {
    // q = (1, 2, 3) at bits=2: bit i of dim d at position i*3+d →
    // 1 + 4 + 16 + 32 = 53 (hand-computed)
    val df = Seq((1.0, 2.0, 3.0), (-5.0, 9.0, 2.0)).toDF("x", "y", "z")
    val keys = df.select(Geometry.zorderKey(
        Seq(($"x", 0.0, 4.0), ($"y", 0.0, 4.0), ($"z", 0.0, 4.0)), bits = 2))
      .collect().map(_.getLong(0))
    assert(keys(0) == 53L)
    // clamped: q = (0, 3, 2) → dim0 contributes 0, key well-defined
    assert(keys(1) >= 0L && keys(1) < 64L)
  }

  test("z-order sorting co-locates spatial neighbors") {
    val rnd = new scala.util.Random(67)
    val pts = (1 to 2000).map(_ => (rnd.nextDouble() * 100,
      rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    def meanAdjacentDist(order: Seq[(Double, Double, Double)]): Double =
      order.sliding(2).map { case Seq(a, b) =>
        math.sqrt(math.pow(a._1 - b._1, 2) + math.pow(a._2 - b._2, 2) +
          math.pow(a._3 - b._3, 2))
      }.sum / (order.size - 1)
    val sorted = pts.toDF("x", "y", "z")
      .withColumn("zk", Geometry.zorderKey(
        Seq(($"x", 0.0, 100.0), ($"y", 0.0, 100.0), ($"z", 0.0, 100.0)), bits = 8))
      .orderBy("zk").select("x", "y", "z")
      .as[(Double, Double, Double)].collect().toSeq
    val dz = meanAdjacentDist(sorted)
    val dr = meanAdjacentDist(rnd.shuffle(pts))
    // random adjacency averages ~66 here; z-order adjacency must be
    // far tighter — that locality is exactly what makes min/max file
    // pruning work on box filters
    assert(dz < dr / 3, s"z-order adjacency $dz vs random $dr")
  }

  test("projectToImage matches the NumPy-derived P2 fixture") {
    // P2 = [[2,0,1,0],[0,2,1,0],[0,0,1,0]] (f=2, cx=cy=1);
    // expected (u, v, depth) computed with numpy: P2 @ (x,y,z,1), /w
    val p2 = Seq(2.0, 0, 1, 0, 0, 2, 1, 0, 0, 0, 1, 0)
    val df = Seq((2.0, 4.0, 8.0), (0.0, 0.0, 4.0), (-1.0, 3.0, 2.0), (0.0, 0.0, -1.0))
      .toDF("x", "y", "z")
      .withColumn("p2", typedLit(p2))
    val Seq(u, v, w) = Geometry.projectToImage($"p2", $"x", $"y", $"z")
    val got = df.select(u.as("u"), v.as("v"), w.as("d"),
        Geometry.inImage(u, v, w, 4.0, 3.0).as("vis"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(got(0) == ((1.5, 2.0, 8.0, true)))
    assert(got(1) == ((1.0, 1.0, 4.0, true)))
    assert(got(2) == ((0.0, 4.0, 2.0, false))) // v = 4 ≥ height 3
    assert(!got(3)._4, "behind the camera must not be visible")
  }
}
