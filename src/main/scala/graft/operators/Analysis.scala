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

  /** Per-frame p-th exact percentile of zCol (the reference's
    * `z_scale`, data_pipeline.py:29) → (frameCol, __z5). Joined onto
    * points AND labels: the reference subtracts the frame's z_scale
    * from point z, label corner z and label location z alike. */
  def frameZScale(points: DataFrame, frameCol: String, zCol: String,
                  p: Double = 0.05): DataFrame =
    points.groupBy(frameCol)
      .agg(expr(s"percentile($zCol, $p)").as("__z5"))

  /** Per-frame z-normalization by the p-th exact percentile of zCol
    * (data_pipeline.py:29-30): z' = z - percentile_frame(z, p). */
  def zNormalize(points: DataFrame, frameCol: String, zCol: String,
                 p: Double = 0.05): DataFrame =
    points.join(frameZScale(points, frameCol, zCol, p), frameCol)
      .withColumn(zCol, col(zCol) - col("__z5"))
      .drop("__z5")

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
    * one call, bit-faithful to its formulas (ReferencePipelineSpec
    * asserts exact hand-derived numbers on a fixture corpus):
    *
    *   - points are calibrated, axis-remapped and z-normalized by the
    *     PER-FRAME 5th-percentile z_scale (py:27-30);
    *   - label corner z AND label location z are reduced by the same
    *     per-frame z_scale before the global extents (py:36, 40-41);
    *   - location extents follow the reference's final remap with the
    *     sign-FLIPPED rotation matrix (py:45-47): (x, y, z)_cam →
    *     (x, z − z_scale, +y) — note +y, not the geometric −y;
    *   - dim extents are reordered (l, w, h) onto the remapped axes
    *     (py:48-49), and every accumulator carries the reference's
    *     seeds (min vs 1e8, max vs 1e-8 — py:12-15), which also makes
    *     a label-free corpus behave identically;
    *   - final area corners are rounded to 2 dp half-even like
    *     Python's round (py:56-61).
    *
    * All distributed; only the six 1-row aggregates are collected. */
  def referenceAnalysis(points: DataFrame, labels: DataFrame,
                        calib: DataFrame): AreaBounds = {
    val calibrated = calibratePoints(points.join(calib, "frame_id"))
    val z5 = frameZScale(calibrated, "frame_id", "z")
    val normalized = calibrated.join(z5, "frame_id")
      .withColumn("z", col("z") - col("__z5"))
    val pts = normalized.agg(
      min(col("x")).as("min_px"), max(col("x")).as("max_px"),
      min(col("y")).as("min_py"), max(col("y")).as("max_py"),
      min(col("z")).as("min_pz"), max(col("z")).as("max_pz"))
    // labels take THEIR frame's z_scale (inner join: the reference
    // pairs files positionally, so a label frame always has points)
    val kept = labels.filter(col("cls") =!= "DontCare").join(z5, "frame_id")
    val crn = kept.select(col("__z5"), inline(Geometry.bbox3dCorners(
        col("dim_h"), col("dim_w"), col("dim_l"),
        col("loc_x"), col("loc_y"), col("loc_z"), col("rotation_y"))))
      .agg(min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
        min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"),
        min(col("cz") - col("__z5")).as("min_cz"),
        max(col("cz") - col("__z5")).as("max_cz"))
    // location extents accumulate over (loc_x, loc_y, loc_z − z_scale)
    // and are then remapped by the sign-flipped matrix (py:45-47):
    // axis y ← camera z − z_scale, axis z ← camera +y. Dims reorder to
    // (l, w, h) (py:48-49).
    val pl = kept.agg(
      min(col("loc_x")).as("min_lx"), max(col("loc_x")).as("max_lx"),
      min(col("loc_z") - col("__z5")).as("min_ly"),
      max(col("loc_z") - col("__z5")).as("max_ly"),
      min(col("loc_y")).as("min_lz"), max(col("loc_y")).as("max_lz"),
      max(col("dim_l")).as("max_dx"), max(col("dim_w")).as("max_dy"),
      max(col("dim_h")).as("max_dz"))
    val row = pts.crossJoin(crn).crossJoin(pl).head()
    // the reference seeds its accumulators with 1e8 (min) / 1e-8 (max)
    // (py:12-15); a NULL aggregate (no labels) is the never-updated seed
    def mn(n: String) =
      if (row.isNullAt(row.fieldIndex(n))) 1e8 else math.min(row.getAs[Double](n), 1e8)
    def mx(n: String) =
      if (row.isNullAt(row.fieldIndex(n))) 1e-8 else math.max(row.getAs[Double](n), 1e-8)
    def axis(ax: String) =
      (mn(s"min_p$ax"), mx(s"max_p$ax"), mn(s"min_c$ax"), mx(s"max_c$ax"),
        mn(s"min_l$ax"), mx(s"max_l$ax"), mx(s"max_d$ax"))
    val axes = Seq(axis("x"), axis("y"), axis("z"))
    // Python round(x, 2) is half-even
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    // minimal area: tightest of points/corners/loc±dim (data_pipeline.py:56-58)
    val minLo = axes.map { case (mp, _, mc, _, ml, _, md) => r2(math.max(mp, math.max(mc, ml - md))) }
    val minHi = axes.map { case (_, xp, _, xc, _, xl, md) => r2(math.min(xp, math.min(xc, xl + md))) }
    // maximal area: loosest object span clamped to the point cloud (py:59-61)
    val maxLo = axes.map { case (mp, _, mc, _, ml, _, md) => r2(math.max(mp, math.min(mc, ml - md))) }
    val maxHi = axes.map { case (_, xp, _, xc, _, xl, md) => r2(math.min(xp, math.max(xc, xl + md))) }
    AreaBounds((minLo, minHi), (maxLo, maxHi))
  }
}
