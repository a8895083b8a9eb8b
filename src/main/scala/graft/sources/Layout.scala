package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout maintenance: small-file compaction and clustered
  * rewrite — the janitorial half of a 100 TB lake that query planning
  * silently depends on. A streaming ingest (foreachBatch appends, CDC
  * merges, per-micro-batch parquet commits) leaves thousands of
  * KB-sized files; every downstream scan then pays file-open +
  * footer-parse + scheduling per file, and row-group statistics are
  * too fine to prune. Compaction rewrites to size-targeted files;
  * clustering additionally sorts so min/max statistics actually prune
  * (the z-order story of `Geometry.zorderKey`, applied at write time).
  */
object Layout {

  /** Total on-disk bytes of a parquet directory (driver-side listing —
    * file metadata only, no data read). */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Rewrite `inPath` to `outPath` with ~`targetFileBytes` files,
    * optionally sorted by `clusterCols` (range-partitioned so files
    * hold contiguous key ranges → parquet min/max stats prune scans).
    * Returns the file count written. The rewrite is one distributed
    * pass; only the file LISTING touches the driver. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              clusterCols: Seq[String] = Nil): Int = {
    val bytes = dirBytes(spark, inPath)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (clusterCols.nonEmpty)
        df.repartitionByRange(nFiles, clusterCols.map(col): _*)
          .sortWithinPartitions(clusterCols.map(col): _*)
      else df.repartition(nFiles)
    out.write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }
}
