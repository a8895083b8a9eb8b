package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables (SURVEY §5): pre-bucketing both
  * fact tables on the join key lets the join run with NO exchange on
  * either side — at 100 TB this turns every recurring fact-fact join
  * from a full shuffle into a local zip. Uses the shared session
  * (external table paths in /tmp; broadcast disabled at runtime). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val orders = (1L to 1000L).map(k => (k, k % 7)).toDF("o_orderkey", "o_flag")
      val lineitem = (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("l_orderkey", "l_id")
      orders.write.mode("overwrite").option("path", s"$dir/o")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      lineitem.write.mode("overwrite").option("path", s"$dir/l")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, plan was:\n$plan")
      assert(joined.count() == 5000)

      // control: the same join over plain (unbucketed) data DOES shuffle
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
