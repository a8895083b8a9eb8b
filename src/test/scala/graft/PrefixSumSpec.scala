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

  test("keyed: matches the stratum-window running sum, mega-stratum included") {
    // one mega-stratum ("en" = 60% of rows — the corpus-mix reality
    // that makes the keyed WINDOW a single-task trap), several small
    // ones, signed deltas, shuffled input order
    val rnd = new Random(47)
    val data = (1 to 8000).map { i =>
      val s = if (rnd.nextInt(10) < 6) "en"
        else Seq("de", "fr", "es", "zh")(rnd.nextInt(4))
      (s, rnd.nextLong(), (rnd.nextInt(11) - 5).toLong)
    }
    val df = data.toDF("lang", "k", "d").repartition(13)
    val got = PrefixSum.runningSumLongKeyed(df, "lang", Seq("k"), "d", "run")
      .orderBy("lang", "k").as[(String, Long, Long, Long)].collect()
    val w = Window.partitionBy("lang").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("run", sum($"d").over(w))
      .orderBy("lang", "k").as[(String, Long, Long, Long)].collect()
    assert(got.sameElements(want))
  }

  test("keyed: invariant under input partitioning") {
    val rnd = new Random(53)
    val data = (1 to 3000).map(i =>
      (s"s${rnd.nextInt(3)}", rnd.nextLong(), 1L))
    val a = PrefixSum.runningSumLongKeyed(data.toDF("s", "k", "d").repartition(2),
      "s", Seq("k"), "d", "run").orderBy("s", "k")
      .as[(String, Long, Long, Long)].collect()
    val b = PrefixSum.runningSumLongKeyed(data.toDF("s", "k", "d").repartition(29),
      "s", Seq("k"), "d", "run").orderBy("s", "k")
      .as[(String, Long, Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("keyed: single stratum spanning every bucket ≡ global running sum") {
    // the extreme: ONE stratum (all rows share the key) must reduce to
    // the global prefix sum, exercising multi-bucket carry chains
    val df = (1 to 6000).map(i => ("only", i.toLong, 2L)).toDF("s", "k", "d")
    val got = PrefixSum.runningSumLongKeyed(df, "s", Seq("k"), "d", "run")
      .orderBy("k").select("k", "run").as[(Long, Long)].collect()
    assert(got.zipWithIndex.forall { case ((k, run), i) =>
      k == i + 1 && run == 2L * (i + 1) })
  }

  test("keyed: empty input") {
    val df = Seq.empty[(String, Long, Long)].toDF("s", "k", "d")
    assert(PrefixSum.runningSumLongKeyed(df, "s", Seq("k"), "d", "run").count() == 0)
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
