package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** End-to-end payoff of the h-range layout `Dedup.winnowIndex`'s
  * scaladoc prescribes (VERDICT r7 item 7): persisting the anchor
  * table hash-bucketed on the fingerprint means a daily-ingest probe
  * only OPENS the buckets its own anchors hash into — partition
  * pruning skips the rest of the index on disk. At 100 TB of corpus
  * index, a small batch probe touches a bounded slice of files
  * instead of the whole anchor table; candidate generation is
  * unchanged because an equi-join on h can only match inside the
  * probe's own buckets. */
class WinnowIndexPruningSpec extends SparkSpec {

  /** Files the parquet scan actually opened (post partition pruning)
    * for the executed plan of `df`. */
  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.sum
  }

  test("bucket-partitioned anchor index prunes probe scans without losing candidates") {
    val nBuckets = 64
    // 2000 hash-word docs; doc 5 re-appears in the batch so the probe
    // has guaranteed index hits
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(997)))): _*)
        .as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-winnowidx").toString
    Dedup.winnowIndex(docs, "doc_id", "text")
      .withColumn("hb", pmod(col("h"), lit(nBuckets)))
      .repartition(col("hb")) // one writer per bucket -> one file per dir
      .write.partitionBy("hb").mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    // the ingest probe: one new doc sharing doc 5's text — its anchors
    // land in a handful of the 64 buckets
    val batch = docs.filter(col("doc_id") === 5)
      .select(lit(999999L).as("doc_id"), col("text"))
    val probe = Dedup.winnowIndex(batch, "doc_id", "text")
      .withColumn("hb", pmod(col("h"), lit(nBuckets)))
      .localCheckpoint(true) // one winnow pass; buckets + join reuse it
    val probeBuckets = probe.select("hb").distinct()
      .collect().map(_.getLong(0))
    assert(probeBuckets.nonEmpty && probeBuckets.length < nBuckets,
      s"probe must occupy a strict subset of buckets, hit ${probeBuckets.length}")

    def candidates(idx: DataFrame): Long =
      idx.alias("c").join(probe.alias("p"),
          col("c.h") === col("p.h") && col("c.doc") =!= col("p.doc"))
        .count()

    val full = index
    val pruned = index.filter(col("hb").isin(probeBuckets.map(Long.box): _*))
    val fullFiles = scanFiles(full)
    val prunedFiles = scanFiles(pruned)
    assert(prunedFiles < fullFiles,
      s"bucket filter must prune files: opened $prunedFiles of $fullFiles")
    assert(prunedFiles <= probeBuckets.length,
      s"opened $prunedFiles files for ${probeBuckets.length} probe buckets")
    // pruning is lossless: an h-equi-join only matches within the
    // probe's own buckets
    val cFull = candidates(full)
    val cPruned = candidates(pruned)
    assert(cPruned == cFull && cFull > 0,
      s"pruned index must yield identical candidates: $cPruned vs $cFull")
  }
}
