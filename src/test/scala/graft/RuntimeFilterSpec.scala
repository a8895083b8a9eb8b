package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection evidence (SURVEY §5): on a shuffle
  * join with a selective creation side, Catalyst injects a bloom
  * filter that prunes the big (application) side's rows BEFORE the
  * shuffle — at 100 TB this is the difference between shuffling the
  * full fact table and shuffling only rows that can possibly match.
  * The spec lowers the application-side size threshold (defaults
  * assume cluster-scale scans), asserts the filter lands in the plan,
  * and asserts result identity with the feature off.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter injected on selective shuffle join; results identical") {
    // real parquet scans: the injection rule targets scan-rooted plans
    // (LocalRelations constant-fold away the selective filter)
    val dir = java.nio.file.Files.createTempDirectory("graft-rtf").toString
    (0L until 20000L).map(i => (i, i % 997)).toDF("id", "k")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 997L).map(i => (i, s"d$i")).toDF("dk", "name")
      .write.mode("overwrite").parquet(s"$dir/dim")
    def joined = {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
        .filter(col("dk") % 100 === 0) // selective creation side
      fact.join(dim, col("k") === col("dk"))
    }

    var withFilter: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = joined
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"expected an injected bloom filter in the optimized plan:\n$plan")
      withFilter = df.orderBy("id", "dk").collect()
    }
    var noFilter: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      noFilter = joined.orderBy("id", "dk").collect()
    }
    assert(withFilter.nonEmpty && withFilter.sameElements(noFilter),
      "runtime filter must not change results")
  }
}
