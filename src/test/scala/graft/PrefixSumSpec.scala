package graft

import scala.util.Random
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** Distributed running sum: differential vs the single-task window
  * formulation, partitioning invariance, and the no-single-task plan
  * property that is the operator's reason to exist. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the unpartitioned window running sum") {
    val rnd = new Random(41)
    val data = (1 to 5000).map(i => (i.toLong, (rnd.nextInt(11) - 5).toLong))
    val df = data.toDF("k", "d")
    val got = PrefixSum.runningSumLong(df, Seq("k"), "d", "run")
      .orderBy("k").as[(Long, Long, Long)].collect()
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("run", sum($"d").over(w))
      .orderBy("k").as[(Long, Long, Long)].collect()
    assert(got.sameElements(want))
  }

  test("invariant under input partitioning") {
    val rnd = new Random(43)
    val data = (1 to 3000).map(i => (rnd.nextLong(), 1L))
    val a = PrefixSum.runningSumLong(data.toDF("k", "d").repartition(2),
      Seq("k"), "d", "run").orderBy("k").as[(Long, Long, Long)].collect()
    val b = PrefixSum.runningSumLong(data.toDF("k", "d").repartition(31),
      Seq("k"), "d", "run").orderBy("k").as[(Long, Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("the running pass stays parallel (no single-task collapse)") {
    val df = (1 to 10000).map(i => (i.toLong, 1L)).toDF("k", "d")
    val out = PrefixSum.runningSumLong(df, Seq("k"), "d", "run")
    // the imperative pass runs on the range-partitioned layout
    assert(out.rdd.getNumPartitions > 1,
      s"running pass collapsed to ${out.rdd.getNumPartitions} partition(s)")
  }

  test("empty input") {
    val df = Seq.empty[(Long, Long)].toDF("k", "d")
    assert(PrefixSum.runningSumLong(df, Seq("k"), "d", "run").count() == 0)
  }

  test("boundary sample is size-bounded independent of n") {
    // the r5 scale-killer: the old sample was ~n/64 keys collected to
    // the driver — 10¹² rows would OOM it. The effective modulus must
    // keep the EXPECTED sample at ~32·nPart keys whatever n is.
    for (n <- Seq(1e6.toLong, 1e9.toLong, 1e12.toLong, Long.MaxValue / 4);
         nPart <- Seq(32, 1000)) {
      val mod = PrefixSum.effectiveSampleMod(n, 64, nPart)
      val expected = n.toDouble / mod
      assert(expected <= PrefixSum.boundaryKeysPerPartition * nPart + 1,
        s"n=$n nPart=$nPart mod=$mod -> expected sample $expected")
    }
    // small inputs keep the caller's sampleMod exactly (r5 behavior)
    assert(PrefixSum.effectiveSampleMod(5000, 64, 32) == 64L)
    assert(PrefixSum.effectiveSampleMod(0, 64, 32) == 64L)
  }
}
