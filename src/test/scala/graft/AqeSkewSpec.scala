package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** The two skew mitigations side by side (VERDICT r1 item 10):
  * AQE's runtime skew-join split (OptimizeSkewedJoin marks the
  * sort-merge join `skew=true` and splits the oversized partition)
  * versus graft's static hot-key salting — same skewed input, same
  * result, two plans. AQE is the default answer for sort-merge skew;
  * salting remains the tool for broadcast-ineligible dims and skewed
  * aggregations (SkewJoin scaladoc).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition at runtime; salting splits it statically") {
    // one 60k-row hot key + 50 cold keys; dim: one row per key
    val fact = ((1 to 60000).map(i => (i.toLong, 1L)) ++
      (1 to 5000).map(i => (100000L + i, 2L + i % 50))).toDF("row_id", "k")
    val dim = (1L to 52L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // thresholds sized to the test data so the 60k-row partition
      // counts as skewed and gets split into advisory-sized chunks
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "131072")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val joined = fact.join(dim, col("k") === col("dk"))
      // collect() executes THIS QueryExecution, finalizing its adaptive
      // plan (count() would build a separate one and leave this initial)
      val n = joined.collect().length.toLong
      assert(n == 65000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n${plan.take(3000)}")

      // static salting: same rows, and the hot key's work is spread
      // across `salts` deterministic sub-keys instead of one task
      val salts = 8
      val salted = SkewJoin.saltedJoin(fact, "k", Seq("row_id"), dim, "dk",
        salts = salts, hotKeys = Some(Seq(1L).toDF("__hot_key")))
      assert(salted.count() == n)
      val sub = fact.filter(col("k") === 1L)
        .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(salts.toLong)))
        .groupBy("__salt").count().select("count").as[Long].collect()
      assert(sub.length == salts && sub.max < 60000L * 2 / salts,
        s"salt sub-keys unbalanced: ${sub.toSeq}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
