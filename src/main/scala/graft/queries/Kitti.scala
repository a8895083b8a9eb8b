package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ql._
import graft.functions.Geometry
import graft.operators.CutOut

/** KITTI-reference semantics bound to the synthetic testdata
  * (SURVEY §2.1/§3): the *operators* are the reference's — per-frame
  * percentile normalization, bbox corner geometry, box cut-out stats,
  * calibration transform — with testdata columns standing in for
  * pointcloud coordinates. KITTI-format readers are exercised by
  * ScalaTest fixtures instead (no KITTI files in /root/testdata).
  */
object Kitti {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // get_analysis: per-frame 5th-pct z-normalize + global extents
    // (events: user_id ≈ frame, value ≈ z)
    "k1_point_extents" -> { (s, d) =>
      val e = t(s, d, "events").select(col("user_id"), col("value"))
      val pf = e.groupBy("user_id").agg(expr("percentile(value, 0.05)").as("z5"))
      e.join(pf, "user_id")
        .agg(round(min(col("value") - col("z5")), 9).as("min_z"),
             round(max(col("value") - col("z5")), 9).as("max_z"),
             min(col("value")).as("min_v"), max(col("value")).as("max_v"),
             count(lit(1)).as("n"))
    },

    // get_3d_bbox corner generation + global corner extents
    // (part: p_size → dims, p_retailprice/p_partkey → location/yaw)
    "k2_bbox_corner_extents" -> { (s, d) =>
      val p = t(s, d, "part").select(
        col("p_size").cast("double").as("h"),
        (col("p_size") * 0.6).as("w"),
        (col("p_size") * 1.3).as("l"),
        (col("p_retailprice") / 100.0).as("x"),
        (col("p_partkey") % 7).cast("double").as("y"),
        (col("p_partkey") % 13).cast("double").as("z"),
        ((col("p_partkey") % 63) / 10.0).as("ry"))
      p.select(inline(Geometry.bbox3dCorners(col("h"), col("w"), col("l"),
          col("x"), col("y"), col("z"), col("ry"))))
        .agg(round(min(col("cx")), 6).as("min_x"), round(max(col("cx")), 6).as("max_x"),
             round(min(col("cy")), 6).as("min_y"), round(max(col("cy")), 6).as("max_y"),
             round(min(col("cz")), 6).as("min_z"), round(max(col("cz")), 6).as("max_z"))
    },

    // gen_cut_out_dataset: box filter + per-frame point-count stats
    // (lineitem: l_orderkey ≈ frame, quantity/discount/tax ≈ coords)
    "k3_cutout_stats" -> { (s, d) =>
      val pts = t(s, d, "lineitem")
        .filter(Geometry.inBox(col("l_quantity"), col("l_discount") * 100,
          col("l_tax") * 100, (5.0, 0.5, 0.5), (45.0, 8.5, 7.5)))
        .select(col("l_orderkey").as("frame_id"))
      CutOut.pointStats(pts)
    },

    // apply_calibration chain: fixed 3x4 transform + axis remap
    "k5_calib_transform" -> { (s, d) =>
      val m = Seq(1.0, 0.02, 0.0, 0.3, 0.0, 0.9, 0.1, -0.2, 0.05, 0.0, 1.1, 0.6)
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 400 === 0 && col("l_linenumber") === 1)
      val Seq(nx, ny, nz) = Geometry.transform3x4(m,
        col("l_quantity"), col("l_extendedprice") / 1000.0, col("l_discount") * 10.0)
      val Seq(px, py, pz) = Geometry.rotateX90(nx, ny, nz)
      li.select(col("l_orderkey"), px.as("px"), py.as("py"), pz.as("pz"))
        .orderBy("l_orderkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "k1_point_extents" ->
      """WITH pf AS (SELECT user_id, quantile_cont(value, 0.05) AS z5
        |  FROM events GROUP BY user_id)
        |SELECT ROUND(MIN(e.value - pf.z5), 9) AS min_z,
        |       ROUND(MAX(e.value - pf.z5), 9) AS max_z,
        |       MIN(e.value) AS min_v, MAX(e.value) AS max_v, COUNT(*) AS n
        |FROM events e JOIN pf USING (user_id)""".stripMargin,

    "k2_bbox_corner_extents" ->
      """WITH p AS (SELECT CAST(p_size AS DOUBLE) AS h, p_size*0.6 AS w, p_size*1.3 AS l,
        |    p_retailprice/100.0 AS x, CAST(p_partkey%7 AS DOUBLE) AS y,
        |    CAST(p_partkey%13 AS DOUBLE) AS z, (p_partkey%63)/10.0 AS ry FROM part),
        | c(sx, sy, sz) AS (VALUES (-0.5,0.0,-0.5),(0.5,0.0,-0.5),(0.5,0.0,0.5),(-0.5,0.0,0.5),
        |    (-0.5,-1.0,-0.5),(0.5,-1.0,-0.5),(0.5,-1.0,0.5),(-0.5,-1.0,0.5)),
        | k AS (SELECT cos(ry)*(sx*l) + sin(ry)*(sz*w) + x AS gx,
        |              -sin(ry)*(sx*l) + cos(ry)*(sz*w) + z AS gy,
        |              -(sy*h + y) AS gz
        |       FROM p CROSS JOIN c)
        |SELECT ROUND(MIN(gx),6) AS min_x, ROUND(MAX(gx),6) AS max_x,
        |       ROUND(MIN(gy),6) AS min_y, ROUND(MAX(gy),6) AS max_y,
        |       ROUND(MIN(gz),6) AS min_z, ROUND(MAX(gz),6) AS max_z
        |FROM k""".stripMargin,

    "k3_cutout_stats" ->
      """WITH pts AS (SELECT l_orderkey AS frame_id FROM lineitem
        |  WHERE l_quantity > 5.0 AND l_discount*100 > 0.5 AND l_tax*100 > 0.5
        |    AND l_quantity < 45.0 AND l_discount*100 < 8.5 AND l_tax*100 < 7.5),
        | cnt AS (SELECT frame_id, COUNT(*) AS n FROM pts GROUP BY frame_id)
        |SELECT MIN(n) AS min_pts, MAX(n) AS max_pts,
        |       ROUND(CAST(SUM(n) AS DOUBLE)/COUNT(*), 6) AS avg_pts,
        |       COUNT(*) AS n_frames
        |FROM cnt""".stripMargin,

    "k5_calib_transform" ->
      """SELECT l_orderkey,
        | 1.0*l_quantity + 0.02*(l_extendedprice/1000.0) + 0.0*(l_discount*10.0) + 0.3 AS px,
        | 0.05*l_quantity + 0.0*(l_extendedprice/1000.0) + 1.1*(l_discount*10.0) + 0.6 AS py,
        | -(0.0*l_quantity + 0.9*(l_extendedprice/1000.0) + 0.1*(l_discount*10.0) + (-0.2)) AS pz
        |FROM lineitem WHERE l_orderkey % 400 = 0 AND l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin
  )
}
