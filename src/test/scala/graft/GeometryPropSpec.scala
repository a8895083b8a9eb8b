package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.functions.Geometry

/** Randomized invariants of the bbox geometry: a Y-rotation +
  * translation + axis remap is rigid, so edge lengths and the corner
  * centroid must be exactly predictable from (dims, location). */
class GeometryPropSpec extends SparkSpec {
  import spark.implicits._

  test("bbox corners preserve edge lengths and centroid under rotation") {
    val rnd = new Random(7)
    val cases = (1 to 20).map { _ =>
      (1 + rnd.nextDouble() * 3, 1 + rnd.nextDouble() * 2, 2 + rnd.nextDouble() * 4,
        rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 4, rnd.nextDouble() * 60,
        rnd.nextDouble() * math.Pi * 2 - math.Pi)
    }
    val rows = cases.toDF("h", "w", "l", "x", "y", "z", "ry")
      .select(col("h"), col("w"), col("l"), col("x"), col("y"), col("z"),
        inline(Geometry.bbox3dCorners(col("h"), col("w"), col("l"),
          col("x"), col("y"), col("z"), col("ry"))))
      .collect()
      .groupBy(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

    rows.foreach { case ((h, w, l), cs) =>
      val pts = cs.sortBy(_.getInt(6)).map(r =>
        (r.getDouble(7), r.getDouble(8), r.getDouble(9))) // cx, cy, cz
      def d(a: (Double, Double, Double), b: (Double, Double, Double)) =
        math.sqrt(math.pow(a._1 - b._1, 2) + math.pow(a._2 - b._2, 2) + math.pow(a._3 - b._3, 2))
      // bottom-face edge 0-1 spans length, 1-2 spans width, 0-4 spans height
      assert(math.abs(d(pts(0), pts(1)) - l) < 1e-9, "length edge")
      assert(math.abs(d(pts(1), pts(2)) - w) < 1e-9, "width edge")
      assert(math.abs(d(pts(0), pts(4)) - h) < 1e-9, "height edge")
      // diagonal of the box is rotation-invariant
      assert(math.abs(d(pts(0), pts(6)) - math.sqrt(h * h + w * w + l * l)) < 1e-9)
    }
    assert(rows.size == 20)
  }
}
