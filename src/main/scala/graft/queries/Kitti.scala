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

  /** Scala side of the shared part→geometry binding (mirrors the
    * `partGeom` SQL fragment below — change both together). */
  private def partGeomDf(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey"),
      col("p_size").cast("double").as("h"),
      (col("p_size") * 0.6).as("w"),
      (col("p_size") * 1.3).as("l"),
      (col("p_retailprice") / 100.0).as("x"),
      (col("p_partkey") % 7).cast("double").as("y"),
      (col("p_partkey") % 13).cast("double").as("z"),
      ((col("p_partkey") % 63) / 10.0).as("ry"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // get_analysis: per-frame 5th-pct z-normalize + global extents
    // (events: user_id ≈ frame, value ≈ z)
    "k1_point_extents" -> { (s, d) =>
      val e = t(s, d, "events").select(col("user_id"), col("value"))
      val pf = e.groupBy("user_id").agg(expr("percentile(value, 0.05)").as("z5"))
      e.join(pf, "user_id")
        .agg(min(col("value") - col("z5")).as("min_z"),
             max(col("value") - col("z5")).as("max_z"),
             min(col("value")).as("min_v"), max(col("value")).as("max_v"),
             count(lit(1)).as("n"))
    },

    // get_3d_bbox corner generation + global corner extents
    // (part: p_size → dims, p_retailprice/p_partkey → location/yaw)
    "k2_bbox_corner_extents" -> { (s, d) =>
      val p = partGeomDf(s, d)
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

    // minimal/maximal "label area" derivation (data_pipeline.py:56-61):
    // greatest/least composition of point, corner and location extents
    "k4_area_derivation" -> { (s, d) =>
      val pts = t(s, d, "lineitem").agg(
        min(col("l_quantity")).as("min_px"), max(col("l_quantity")).as("max_px"),
        min(col("l_discount") * 100).as("min_py"), max(col("l_discount") * 100).as("max_py"),
        min(col("l_tax") * 100).as("min_pz"), max(col("l_tax") * 100).as("max_pz"))
      val p = partGeomDf(s, d)
      val crn = p.select(inline(Geometry.bbox3dCorners(col("h"), col("w"), col("l"),
          col("x"), col("y"), col("z"), col("ry"))))
        .agg(min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
             min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"),
             min(col("cz")).as("min_cz"), max(col("cz")).as("max_cz"))
      val pl = p.agg(
        min(col("x")).as("min_lx"), max(col("x")).as("max_lx"),
        min(col("y")).as("min_ly"), max(col("y")).as("max_ly"),
        min(col("z")).as("min_lz"), max(col("z")).as("max_lz"),
        max(col("l")).as("max_dx"), max(col("w")).as("max_dy"),
        max(col("h")).as("max_dz"))
      pts.crossJoin(crn).crossJoin(pl).select(
        round(greatest(col("min_px"), greatest(col("min_cx"), col("min_lx") - col("max_dx"))), 6).as("lo_x"),
        round(least(col("max_px"), least(col("max_cx"), col("max_lx") + col("max_dx"))), 6).as("hi_x"),
        round(greatest(col("min_py"), greatest(col("min_cy"), col("min_ly") - col("max_dy"))), 6).as("lo_y"),
        round(least(col("max_py"), least(col("max_cy"), col("max_ly") + col("max_dy"))), 6).as("hi_y"),
        round(greatest(col("min_pz"), greatest(col("min_cz"), col("min_lz") - col("max_dz"))), 6).as("lo_z"),
        round(least(col("max_pz"), least(col("max_cz"), col("max_lz") + col("max_dz"))), 6).as("hi_z"))
    },

    // wireframe edge segments (visualize.py:85-98)
    "k6_bbox_edges" -> { (s, d) =>
      val p = partGeomDf(s, d).filter(col("p_partkey") <= 3)
      // corners as rows once, then a tiny self-join on corner index —
      // embedding 72 references to the corner array in one projection
      // re-inlines the trig expression per reference (measured 34 s of
      // codegen for 4 rows); the join shape is linear and mirrors the
      // oracle SQL exactly.
      import s.implicits._
      val corners = p.select(col("p_partkey"), inline(Geometry.bbox3dCorners(
        col("h"), col("w"), col("l"), col("x"), col("y"), col("z"), col("ry"))))
      val edges = Geometry.bboxEdges.zipWithIndex
        .map { case ((a, b), id) => (id.toLong, a, b) }.toDF("edge_id", "s", "e")
      val k1 = corners.select(col("p_partkey"), col("i").as("ci1"),
        col("cx").as("x1"), col("cy").as("y1"), col("cz").as("z1"))
      val k2 = corners.select(col("p_partkey").as("pk2"), col("i").as("ci2"),
        col("cx").as("x2"), col("cy").as("y2"), col("cz").as("z2"))
      broadcast(edges)
        .join(k1, col("ci1") === col("s"))
        .join(k2, col("ci2") === col("e") && col("pk2") === col("p_partkey"))
        .select(col("p_partkey"), col("edge_id"),
          round(col("x1"), 6).as("x1"), round(col("y1"), 6).as("y1"),
          round(col("z1"), 6).as("z1"), round(col("x2"), 6).as("x2"),
          round(col("y2"), 6).as("y2"), round(col("z2"), 6).as("z2"))
        .orderBy("p_partkey", "edge_id")
    },

    // z-order spatial clustering key over the cut-out coordinate
    // space — the layout that makes 3D box filters prune files at
    // scale; exact integer oracle
    "k7_zorder_cluster" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
          Geometry.zorderKey(Seq(
            (col("l_quantity"), 0.0, 50.0),
            (col("l_discount") * 100, 0.0, 10.0),
            (col("l_tax") * 100, 0.0, 8.0)), bits = 8).as("zkey"))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },

    // voxel-grid downsampling — the standard lidar preprocessing step
    // (reference operates on raw clouds; any 100 TB cloud pipeline
    // downsamples first): points bucketed into fixed-size voxels, one
    // centroid row per voxel. ONE groupBy shuffle with map-side
    // combine; centroids from exact decimal sums so the result is
    // partitioning-invariant and oracle-exact.
    "k8_voxel_downsample" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      val x = col("l_quantity"); val y = col("l_discount") * 100
      val z = col("l_tax") * 100
      li.groupBy(
          floor(x / 5.0).cast("long").as("vx"),
          floor(y / 1.0).cast("long").as("vy"),
          floor(z / 1.0).cast("long").as("vz"))
        .agg(count(lit(1)).as("n"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("cx"),
          (sum(dec(col("l_discount")) * 100).cast("double") / count(lit(1))).as("cy"),
          (sum(dec(col("l_tax")) * 100).cast("double") / count(lit(1))).as("cz"))
        .orderBy("vx", "vy", "vz")
    },

    // multi-density patch generation — the data_pipeline.py:96-99
    // TODO (the reference's one unimplemented surface): six staggered
    // density bands of the k3 area box, a point's band position being
    // its box-normalized Chebyshev distance from the area center.
    // Per-patch yield stats; exact decimal mean keeps the double
    // average reproducible. Map-side 6-way bounded fan-out + one
    // aggregation — the same scan-shape as k3's pushable box mask.
    "k10_density_patches" -> { (s, d) =>
      val pts = t(s, d, "lineitem").select(
        col("l_orderkey").as("frame_id"),
        col("l_quantity").cast("double").as("x"),
        (col("l_discount") * 100).cast("double").as("y"),
        (col("l_tax") * 100).cast("double").as("z"))
      CutOut.densityPatches(pts, (5.0, 0.5, 0.5), (45.0, 8.5, 7.5))
        .groupBy("patch")
        .agg(count(lit(1)).as("n_pts"),
          countDistinct(col("frame_id")).as("n_frames"),
          (sum(col("band_d").cast("decimal(30,15)")).cast("double") /
            count(lit(1))).as("avg_d"))
        .orderBy("patch")
    },

    // bird's-eye-view occupancy grid — the 2D top-down raster AV
    // stacks feed to detection models: per-cell point count, max
    // height, exact mean intensity. Same single-shuffle shape as k8.
    "k9_bev_grid" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      li.groupBy(
          floor(col("l_quantity") / 2.0).cast("long").as("gx"),
          floor(col("l_discount") * 100 / 1.0).cast("long").as("gy"))
        .agg(count(lit(1)).as("n_pts"),
          max(col("l_tax") * 100).as("max_z"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
            .as("avg_intensity"))
        .orderBy("gx", "gy")
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

  private val partGeom =
    """SELECT p_partkey, CAST(p_size AS DOUBLE) AS h, p_size*0.6 AS w, p_size*1.3 AS l,
      |    p_retailprice/100.0 AS x, CAST(p_partkey%7 AS DOUBLE) AS y,
      |    CAST(p_partkey%13 AS DOUBLE) AS z, (p_partkey%63)/10.0 AS ry FROM part""".stripMargin

  private val cornerOffsets =
    """c(ci, sx, sy, sz) AS (VALUES (0,-0.5,0.0,-0.5),(1,0.5,0.0,-0.5),(2,0.5,0.0,0.5),(3,-0.5,0.0,0.5),
      |    (4,-0.5,-1.0,-0.5),(5,0.5,-1.0,-0.5),(6,0.5,-1.0,0.5),(7,-0.5,-1.0,0.5))""".stripMargin

  private val zorderSql: String = {
    def q(c: String, lo: Double, hi: Double) =
      s"LEAST(255, GREATEST(0, CAST(FLOOR(($c - $lo)/${hi - lo} * 256) AS BIGINT)))"
    val terms = (for { i <- 0 until 8; j <- 0 until 3 } yield
      s"(((q$j >> $i) & 1) * ${1L << (i * 3 + j)})").mkString(" + ")
    s"""WITH qd AS (SELECT l_orderkey, l_linenumber,
       |    ${q("l_quantity", 0.0, 50.0)} AS q0,
       |    ${q("l_discount*100", 0.0, 10.0)} AS q1,
       |    ${q("l_tax*100", 0.0, 8.0)} AS q2 FROM lineitem)
       |SELECT l_orderkey, l_linenumber, $terms AS zkey
       |FROM qd ORDER BY zkey, l_orderkey, l_linenumber LIMIT 20""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "k7_zorder_cluster" -> zorderSql,
    "k4_area_derivation" ->
      s"""WITH p AS ($partGeom),
        | $cornerOffsets,
        | k AS (SELECT cos(ry)*(sx*l) + sin(ry)*(sz*w) + x AS gx,
        |              -sin(ry)*(sx*l) + cos(ry)*(sz*w) + z AS gy,
        |              -(sy*h + y) + 0.0 AS gz
        |       FROM p CROSS JOIN c),
        | crn AS (SELECT MIN(gx) min_cx, MAX(gx) max_cx, MIN(gy) min_cy,
        |      MAX(gy) max_cy, MIN(gz) min_cz, MAX(gz) max_cz FROM k),
        | pts AS (SELECT MIN(l_quantity) min_px, MAX(l_quantity) max_px,
        |      MIN(l_discount*100) min_py, MAX(l_discount*100) max_py,
        |      MIN(l_tax*100) min_pz, MAX(l_tax*100) max_pz FROM lineitem),
        | pl AS (SELECT MIN(x) min_lx, MAX(x) max_lx, MIN(y) min_ly, MAX(y) max_ly,
        |      MIN(z) min_lz, MAX(z) max_lz, MAX(l) max_dx, MAX(w) max_dy,
        |      MAX(h) max_dz FROM p)
        |SELECT
        | ROUND(GREATEST(min_px, GREATEST(min_cx, min_lx - max_dx)), 6) AS lo_x,
        | ROUND(LEAST(max_px, LEAST(max_cx, max_lx + max_dx)), 6) AS hi_x,
        | ROUND(GREATEST(min_py, GREATEST(min_cy, min_ly - max_dy)), 6) AS lo_y,
        | ROUND(LEAST(max_py, LEAST(max_cy, max_ly + max_dy)), 6) AS hi_y,
        | ROUND(GREATEST(min_pz, GREATEST(min_cz, min_lz - max_dz)), 6) AS lo_z,
        | ROUND(LEAST(max_pz, LEAST(max_cz, max_lz + max_dz)), 6) AS hi_z
        |FROM pts CROSS JOIN crn CROSS JOIN pl""".stripMargin,

    "k6_bbox_edges" ->
      s"""WITH p AS ($partGeom WHERE p_partkey <= 3),
        | $cornerOffsets,
        | k AS (SELECT p_partkey, ci,
        |              cos(ry)*(sx*l) + sin(ry)*(sz*w) + x AS gx,
        |              -sin(ry)*(sx*l) + cos(ry)*(sz*w) + z AS gy,
        |              -(sy*h + y) + 0.0 AS gz
        |       FROM p CROSS JOIN c),
        | e(edge_id, s, t) AS (VALUES (0,0,1),(1,1,2),(2,2,3),(3,3,0),
        |    (4,4,5),(5,5,6),(6,6,7),(7,7,4),(8,0,4),(9,1,5),(10,2,6),(11,3,7))
        |SELECT k1.p_partkey, CAST(e.edge_id AS BIGINT) AS edge_id,
        | ROUND(k1.gx,6) AS x1, ROUND(k1.gy,6) AS y1, ROUND(k1.gz,6) AS z1,
        | ROUND(k2.gx,6) AS x2, ROUND(k2.gy,6) AS y2, ROUND(k2.gz,6) AS z2
        |FROM e JOIN k k1 ON k1.ci = e.s JOIN k k2 ON k2.ci = e.t
        |  AND k1.p_partkey = k2.p_partkey
        |ORDER BY k1.p_partkey, edge_id""".stripMargin,

    "k1_point_extents" ->
      """WITH pf AS (SELECT user_id, quantile_cont(value, 0.05) AS z5
        |  FROM events GROUP BY user_id)
        |SELECT MIN(e.value - pf.z5) AS min_z,
        |       MAX(e.value - pf.z5) AS max_z,
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
        |              -(sy*h + y) + 0.0 AS gz
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
        |       CAST(SUM(n) AS DOUBLE)/COUNT(*) AS avg_pts,
        |       COUNT(*) AS n_frames
        |FROM cnt""".stripMargin,

    "k8_voxel_downsample" ->
      """SELECT CAST(FLOOR(l_quantity/5.0) AS BIGINT) AS vx,
        | CAST(FLOOR(l_discount*100/1.0) AS BIGINT) AS vy,
        | CAST(FLOOR(l_tax*100/1.0) AS BIGINT) AS vz,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS cx,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))*100) AS DOUBLE)/COUNT(*) AS cy,
        | CAST(SUM(CAST(l_tax AS DECIMAL(18,2))*100) AS DOUBLE)/COUNT(*) AS cz
        |FROM lineitem GROUP BY vx, vy, vz ORDER BY vx, vy, vz""".stripMargin,

    // band bounds written as the same double expressions the Scala
    // side evaluates (1.0/6, 13.0/42, ...) so both engines compare
    // against bit-identical doubles
    "k10_density_patches" ->
      """WITH pts AS (SELECT l_orderkey AS frame_id,
        |   GREATEST(abs(CAST(l_quantity AS DOUBLE) - 25.0)/20.0,
        |            abs(CAST(l_discount*100 AS DOUBLE) - 4.5)/4.0,
        |            abs(CAST(l_tax*100 AS DOUBLE) - 4.0)/3.5) AS d
        |  FROM lineitem),
        | bands(patch, lo, hi) AS (VALUES
        |   ('dense_1', 0.0, 1.0/6), ('dense_2', 1.0/7, 13.0/42),
        |   ('medium_1', 0.25, 0.45), ('medium_2', 0.4, 0.6),
        |   ('least_1', 0.5, 0.75), ('least_2', 2.0/3, 1.0))
        |SELECT patch, COUNT(*) AS n_pts,
        | COUNT(DISTINCT frame_id) AS n_frames,
        | CAST(SUM(CAST(d AS DECIMAL(30,15))) AS DOUBLE)/COUNT(*) AS avg_d
        |FROM pts JOIN bands ON d >= lo AND d <= hi
        |GROUP BY patch ORDER BY patch""".stripMargin,

    "k9_bev_grid" ->
      """SELECT CAST(FLOOR(l_quantity/2.0) AS BIGINT) AS gx,
        | CAST(FLOOR(l_discount*100/1.0) AS BIGINT) AS gy,
        | COUNT(*) AS n_pts, MAX(l_tax*100) AS max_z,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_intensity
        |FROM lineitem GROUP BY gx, gy ORDER BY gx, gy""".stripMargin,

    "k5_calib_transform" ->
      """SELECT l_orderkey,
        | 1.0*l_quantity + 0.02*(l_extendedprice/1000.0) + 0.0*(l_discount*10.0) + 0.3 AS px,
        | 0.05*l_quantity + 0.0*(l_extendedprice/1000.0) + 1.1*(l_discount*10.0) + 0.6 AS py,
        | -(0.0*l_quantity + 0.9*(l_extendedprice/1000.0) + 0.1*(l_discount*10.0) + (-0.2)) + 0.0 AS pz
        |FROM lineitem WHERE l_orderkey % 400 = 0 AND l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin
  )
}
