package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Compaction: many small files → few size-targeted files, content
  * identical; clustered rewrite sorts so parquet min/max stats prune. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles((_, n) => n.endsWith(".parquet")).toSeq

  test("compacts a fragmented table without changing its contents") {
    val dir = Files.createTempDirectory("layout").toFile.getAbsolutePath
    val in = s"$dir/in"; val out = s"$dir/out"
    // 64 tiny files
    (1 to 200000).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .repartition(64).write.parquet(in)
    assert(parquetFiles(in).size == 64)
    val total = Layout.dirBytes(spark, in)
    Layout.compact(spark, in, out, targetFileBytes = (total / 4) + 1)
    val outFiles = parquetFiles(out)
    assert(outFiles.size <= 8, s"still fragmented: ${outFiles.size} files")
    // content identical
    val a = spark.read.parquet(in).orderBy("k").as[(Long, Long)].collect()
    val b = spark.read.parquet(out).orderBy("k").as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("clustered rewrite: selective scans read fewer rows (stats pruning)") {
    val dir = Files.createTempDirectory("layout2").toFile.getAbsolutePath
    val in = s"$dir/in"; val out = s"$dir/out"
    // keys shuffled across files -> every file spans the whole range
    (1 to 400000).map(i => ((i * 2654435761L) % 1000000L, i.toLong))
      .toDF("k", "v").repartition(16).write.parquet(in)
    val total = Layout.dirBytes(spark, in)
    Layout.compact(spark, in, out, targetFileBytes = (total / 8) + 1,
      clusterCols = Seq("k"))

    def rowsRead(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("k") < 50000L)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }
    val scattered = rowsRead(in)
    val clustered = rowsRead(out)
    assert(clustered < scattered / 2,
      s"clustering did not prune: $clustered vs $scattered rows emitted")
    // same answer either way
    assert(spark.read.parquet(in).filter(col("k") < 50000L).count() ==
      spark.read.parquet(out).filter(col("k") < 50000L).count())
  }
}
