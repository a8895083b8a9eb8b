package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Geometry

/** The reference's `get_analysis` (data_pipeline.py:8-64) decomposed
  * into reusable distributed aggregations. The reference accumulates
  * min/max in a driver loop over files; here every step is a groupBy /
  * global aggregate that map-side-combines, so the 100 TB case is one
  * shuffle per step (and the per-frame percentile join co-partitions
  * with the points on frame_id).
  */
object Analysis {

  /** Per-frame z-normalization by the p-th exact percentile of zCol
    * (data_pipeline.py:29-30): z' = z - percentile_frame(z, p). */
  def zNormalize(points: DataFrame, frameCol: String, zCol: String,
                 p: Double = 0.05): DataFrame = {
    val pf = points.groupBy(frameCol)
      .agg(expr(s"percentile($zCol, $p)").as("__z5"))
    points.join(pf, frameCol)
      .withColumn(zCol, col(zCol) - col("__z5"))
      .drop("__z5")
  }

  /** Global min/max extents of the given columns — one row:
    * min_<c>, max_<c> per column (data_pipeline.py:31-32). */
  def extents(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      min(col(cols.head)).as(s"min_${cols.head}"),
      (max(col(cols.head)).as(s"max_${cols.head}") +:
        cols.tail.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)

  /** Full reference calibration chain on a points+calib frame join:
    * Tr_velo_to_cam (3x4) then R0_rect (3x3) then the fixed axis remap
    * (data_utils.py:82-92 + data_pipeline.py:28). Expects columns
    * x,y,z and array cols `tr_velo_to_cam`, `r0_rect`. */
  def calibratePoints(pointsWithCalib: DataFrame): DataFrame = {
    val Seq(cx, cy, cz) = Geometry.transform3x4Col(
      col("tr_velo_to_cam"), col("x"), col("y"), col("z"))
    val Seq(rx, ry0, rz) = Geometry.transform3x3Col(col("r0_rect"), cx, cy, cz)
    val Seq(fx, fy, fz) = Geometry.rotateX90(rx, ry0, rz)
    pointsWithCalib
      .withColumn("__nx", fx).withColumn("__ny", fy).withColumn("__nz", fz)
      .withColumn("x", col("__nx")).withColumn("y", col("__ny")).withColumn("z", col("__nz"))
      .drop("__nx", "__ny", "__nz")
  }

  /** Label-derived extents excluding DontCare (data_pipeline.py:34-43):
    * explodes the 8 rotated box corners per label and aggregates
    * min/max over corner coords and over dims/locations. */
  def labelCornerExtents(labels: DataFrame): DataFrame = {
    val corners = labels.filter(col("cls") =!= "DontCare")
      .select(col("dim_h"), col("dim_w"), col("dim_l"),
        inline(Geometry.bbox3dCorners(col("dim_h"), col("dim_w"), col("dim_l"),
          col("loc_x"), col("loc_y"), col("loc_z"), col("rotation_y"))))
    extents(corners, Seq("cx", "cy", "cz"))
  }

  /** Area bounds as returned by the reference's `get_analysis`. */
  case class AreaBounds(minimal: (Seq[Double], Seq[Double]),
                        maximal: (Seq[Double], Seq[Double]))

  /** The reference's whole `get_analysis` (data_pipeline.py:8-64) in
    * one call: calibrate points, z-normalize per frame, aggregate
    * point/corner/location extents, derive the minimal/maximal label
    * areas. Returns the two (lo, hi) corner triples. All distributed;
    * only the six 1-row aggregates are collected. */
  def referenceAnalysis(points: DataFrame, labels: DataFrame,
                        calib: DataFrame): AreaBounds = {
    val calibrated = calibratePoints(points.join(calib, "frame_id"))
    val normalized = zNormalize(calibrated, "frame_id", "z")
    val pts = normalized.agg(
      min(col("x")).as("min_px"), max(col("x")).as("max_px"),
      min(col("y")).as("min_py"), max(col("y")).as("max_py"),
      min(col("z")).as("min_pz"), max(col("z")).as("max_pz"))
    val kept = labels.filter(col("cls") =!= "DontCare")
    val crn = kept.select(inline(Geometry.bbox3dCorners(
        col("dim_h"), col("dim_w"), col("dim_l"),
        col("loc_x"), col("loc_y"), col("loc_z"), col("rotation_y"))))
      .agg(min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
        min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"),
        min(col("cz")).as("min_cz"), max(col("cz")).as("max_cz"))
    // location/dims in the remapped frame: loc → (x, z, -y); dims span
    // (l, w, h) along the remapped axes (cf. data_pipeline.py:46-49)
    val pl = kept.agg(
      min(col("loc_x")).as("min_lx"), max(col("loc_x")).as("max_lx"),
      min(col("loc_z")).as("min_ly"), max(col("loc_z")).as("max_ly"),
      min(-col("loc_y")).as("min_lz"), max(-col("loc_y")).as("max_lz"),
      max(col("dim_l")).as("max_dx"), max(col("dim_w")).as("max_dy"),
      max(col("dim_h")).as("max_dz"))
    val row = pts.crossJoin(crn).crossJoin(pl).head()
    def d(n: String) = row.getAs[Double](n)
    def axis(ax: String) =
      (d(s"min_p$ax"), d(s"max_p$ax"), d(s"min_c$ax"), d(s"max_c$ax"),
        d(s"min_l$ax"), d(s"max_l$ax"), d(s"max_d$ax"))
    val axes = Seq(axis("x"), axis("y"), axis("z"))
    // minimal area: tightest of points/corners/loc±dim (data_pipeline.py:56-58)
    val minLo = axes.map { case (mp, _, mc, _, ml, _, md) => math.max(mp, math.max(mc, ml - md)) }
    val minHi = axes.map { case (_, xp, _, xc, _, xl, md) => math.min(xp, math.min(xc, xl + md)) }
    // maximal area: loosest object span clamped to the point cloud (py:59-61)
    val maxLo = axes.map { case (mp, _, mc, _, ml, _, md) => math.max(mp, math.min(mc, ml - md)) }
    val maxHi = axes.map { case (_, xp, _, xc, _, xl, md) => math.min(xp, math.max(xc, xl + md)) }
    AreaBounds((minLo, minHi), (maxLo, maxHi))
  }
}
