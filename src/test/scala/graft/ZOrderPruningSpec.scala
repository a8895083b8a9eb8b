package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.functions.Geometry

/** End-to-end payoff of z-order layout (SURVEY §2.1 K-layout): writing
  * a pointcloud sorted by its Morton key makes every parquet row group
  * carry TIGHT x/y/z min/max stats, so a 3D box filter prunes row
  * groups at scan time — the same predicate over a random layout reads
  * (nearly) everything. At 100 TB this is the difference between
  * scanning the corpus and scanning the box. */
class ZOrderPruningSpec extends SparkSpec {
  import spark.implicits._

  /** Rows the parquet scan emitted (post row-group pruning + pushed
    * filters) for the executed plan of `df`. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-order-sorted files prune a 3D box scan; random layout does not") {
    val n = 200000
    val pts = spark.range(n).select(
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double") / 10.0).as("x"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("double") / 10.0).as("y"),
      (pmod(xxhash64(col("id"), lit(3)), lit(1000)).cast("double") / 10.0).as("z"))
    val dims = Seq((col("x"), 0.0, 100.0), (col("y"), 0.0, 100.0), (col("z"), 0.0, 100.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    // z-ordered layout: range-partition + sort by the Morton key so
    // row groups cover compact 3D cells
    pts.withColumn("zk", Geometry.zorderKey(dims, bits = 10))
      .repartitionByRange(8, col("zk")).sortWithinPartitions("zk")
      .drop("zk")
      .write.mode("overwrite").parquet(s"$dir/sorted")
    // control: same rows, hash-scattered
    pts.repartition(8).write.mode("overwrite").parquet(s"$dir/random")

    def box(df: DataFrame) = df.filter(
      col("x").between(10.0, 20.0) && col("y").between(10.0, 20.0) &&
        col("z").between(10.0, 20.0))
    val sortedRows = scanOutputRows(box(spark.read.parquet(s"$dir/sorted")))
    val randomRows = scanOutputRows(box(spark.read.parquet(s"$dir/random")))
    val matches = box(spark.read.parquet(s"$dir/random")).count()

    assert(sortedRows < randomRows / 3,
      s"z-order layout should prune row groups: sorted scan emitted $sortedRows " +
        s"rows vs $randomRows on the random layout (true matches: $matches)")
  }
}
