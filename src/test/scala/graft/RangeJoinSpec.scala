package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucket-chunked range join: differential vs the naive non-equi join
  * across bucket widths (coarse and fine), boundary inclusivity, and
  * the plan-shape guarantee (equi-join, no BNLJ). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches naive non-equi join across bucket widths") {
    val rnd = new Random(47)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200))
      .toDF("pid", "v")
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextDouble() * 900 - 250
      (i.toLong, lo, lo + rnd.nextDouble() * 120)
    }.toDF("iid", "lo", "hi")
    val want = pts.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    for (w <- Seq(5.0, 50.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"width=$w: ${got.size} vs ${want.size}")
    }
  }

  test("bounds are inclusive on both ends; empty intervals match nothing") {
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, 15.0)).toDF("pid", "v")
    val ivs = Seq((1L, 10.0, 20.0), (2L, 30.0, 25.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 7.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("plan is an equi-join on buckets, not a BNLJ") {
    val pts = spark.range(100).select($"id".as("pid"), ($"id" * 3.0).as("v"))
    val ivs = spark.range(20).select($"id".as("iid"),
      ($"id" * 10.0).as("lo"), ($"id" * 10.0 + 25.0).as("hi"))
    val plan = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }
}
