package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Randomized differential test: AsOfJoin's union+window plan vs a
  * naive per-row reference implementation, over data with duplicate
  * timestamps, unmatched keys, and boundary-equal times. */
class AsOfJoinPropSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward equals the naive reference on randomized data") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val keys = 1 to 8
      val left = (1 to 150).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.size)).toLong, rnd.nextInt(100).toLong)
      } // (l_id, key, time)
      val right = (1 to 120).map { j =>
        (j.toLong + 1000, keys(rnd.nextInt(keys.size)).toLong, rnd.nextInt(100).toLong)
      } // (r_id, key, time)

      // naive: for each left row, the right row with max time <= l.time
      // (tie on time broken by max r_id — mirror the operator's "last
      // in sort order" with a unique secondary sort)
      val rightSorted = right.sortBy(r => (r._3, r._1))
      val expected = left.flatMap { case (lid, k, lt) =>
        rightSorted.filter(r => r._2 == k && r._3 <= lt).lastOption
          .map(r => (lid, r._1))
      }.toSet

      val lDf = left.toDF("l_id", "k", "lt")
      // sort key inside the operator is (__t, __src); to make ties
      // deterministic the right payload carries r_id and we compare
      // against the naive rule above via the same (time, r_id) order —
      // so feed right pre-sorted is NOT needed; instead dedupe ties:
      val rDf = right.toDF("r_id", "rk", "rt")
        .groupBy("rk", "rt").agg(max("r_id").as("r_id"))
      // BOTH adaptive branches must match the naive reference:
      // hubFactor=0 forces the bucketed two-level carry,
      // hubFactor=MaxValue forces the single keyed window
      for (hf <- Seq(0.0, Double.MaxValue)) {
        val got = AsOfJoin.asofBackward(lDf, "k", "lt", rDf, "rk", "rt",
            hubFactor = hf)
          .select("l_id", "r_id").as[(Long, Long)].collect().toSet
        assert(got == expected, s"trial $trial hubFactor=$hf mismatch")
      }
    }
  }

  test("null keys: both adaptive branches agree — null matches null " +
      "(the window groups nulls; the carry join is null-safe)") {
    val lDf = Seq((1L, Option(1L), 10L), (2L, Option.empty[Long], 10L),
      (3L, Option.empty[Long], 5L)).toDF("l_id", "k", "lt")
    val rDf = Seq((100L, Option(1L), 5L), (200L, Option.empty[Long], 4L),
      (300L, Option.empty[Long], 8L)).toDF("r_id", "rk", "rt")
    def run(hf: Double) =
      AsOfJoin.asofBackward(lDf, "k", "lt", rDf, "rk", "rt", hubFactor = hf)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val bucketed = run(0.0)
    assert(bucketed == run(Double.MaxValue),
      "bucketed and window paths disagree on null keys")
    assert(bucketed == Set((1L, 100L), (2L, 300L), (3L, 200L)))
  }

  test("adaptive switch: balanced keys take the single-window path, " +
      "a hub key engages the bucketed carry") {
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(df: org.apache.spark.sql.DataFrame): Int = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def flat(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
        case _ => p +: p.children.flatMap(flat)
      }
      flat(df.queryExecution.executedPlan).count(_.isInstanceOf[WindowExec])
    }
    val balancedL = (1 to 400)
      .map(i => (i.toLong, (i % 40).toLong, (i % 97).toLong))
      .toDF("l_id", "k", "lt")
    val balancedR = (1 to 400)
      .map(j => (j.toLong + 1000, (j % 40).toLong, (j % 89).toLong))
      .toDF("r_id", "rk", "rt").groupBy("rk", "rt")
      .agg(max("r_id").as("r_id"))
    // fast path: exactly ONE window (the per-key running last)
    assert(windows(AsOfJoin.asofBackward(
      balancedL, "k", "lt", balancedR, "rk", "rt")) === 1)
    // hub: one key holds ~95 % of rows — the bucketed carry's TWO
    // bounded windows appear instead
    val hubL = (1 to 800)
      .map(i => (i.toLong, if (i % 50 == 0) i.toLong else 7L, (i % 97).toLong))
      .toDF("l_id", "k", "lt")
    assert(windows(AsOfJoin.asofBackward(
      hubL, "k", "lt", balancedR, "rk", "rt")) === 2)
  }
}
