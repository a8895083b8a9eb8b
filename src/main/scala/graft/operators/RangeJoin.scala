package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join (SURVEY §2.2 R19).
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join as a
  * BroadcastNestedLoopJoin — every task scans every interval, and at
  * scale the interval side can't broadcast. Bucket chunking makes it
  * an equi-join: chunk the value domain into `bucketWidth`-wide
  * buckets, replicate each interval into the buckets it overlaps
  * (ceil(span/width)+1 rows — bounded, choose width ≈ median span),
  * route each point to its single bucket, hash-join on the bucket id
  * and re-check the exact bounds. Shuffle volume: points × 1 +
  * intervals × (span/width + 1); per-task work is one bucket's
  * points × that bucket's intervals, not the full cross product.
  *
  * Inclusive bounds [lo, hi], mirroring SQL BETWEEN so the DuckDB
  * oracle (an IEJoin there) is the exact same predicate.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol)) // empty intervals match nothing
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, pb("__bucket") === ib("__bucket") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
